"""Device mesh construction and sharding helpers.

The reference is strictly single-device (SURVEY.md section 2b: no distributed
code of any kind); every capability here is TPU-native by design. The logical
mesh has two axes:

- ``data``:    data parallelism for training (batch sharding; XLA inserts the
               gradient psum over ICI when the loss reduces over the batch).
- ``spatial``: intra-image tile parallelism for large-image inference
               (parallel/spatial.py exchanges conv halos over this axis with
               ppermute).

Multi-host: ``jax.distributed.initialize()`` (called by the launcher, not
here) makes ``jax.devices()`` span all hosts; the same mesh constructors then
produce a pod-slice mesh where the collectives ride ICI within a slice and
DCN across hosts.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, spatial: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * spatial
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(data, spatial)
    return Mesh(grid, ("data", "spatial"))


def make_mesh_2d(sph: int = 1, spw: int = 1, devices=None) -> Mesh:
    """2-D spatial mesh for H x W tile parallelism (parallel/spatial.py
    tiled_encode_2d/tiled_decode_2d): axis ``sph`` shards image rows,
    ``spw`` shards columns. For 4K-class inputs a (2, 4) mesh gives 8-way
    tiles with two-axis ppermute halo exchange over ICI."""
    if devices is None:
        devices = jax.devices()
    n = sph * spw
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(sph, spw)
    return Mesh(grid, ("sph", "spw"))


def shard_batch(batch, mesh: Mesh):
    """Place a [N, ...] batch sharded over the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))

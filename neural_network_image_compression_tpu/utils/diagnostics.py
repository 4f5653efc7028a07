"""Training/eval diagnostics.

- :func:`discrete_entropy` — the tf1_13 in-graph 256-bin Shannon-entropy
  diagnostic of the rounded latent (reference tf1_13/src/training.py:66-71),
  used there for TensorBoard and the checkpoint acceptance gate. Implemented
  as a one-hot-free bincount via segment_sum so it stays jittable.
- :func:`latent_visualization` / :func:`side_by_side` — the legacy
  validation artifacts (reference tf2_0/src/models.py:246-262:
  ``val_encoded.png`` packed-latent visualization and ``val_comparison.png``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def discrete_entropy(latent: jnp.ndarray, levels: int = 256) -> jnp.ndarray:
    """Shannon entropy (bits/symbol) of the rounded latent, per batch item.

    latent: [N, ...] float in [0,1]. Mirrors reference
    tf1_13/src/training.py:66-71 (histogram over 256 bins, p*log2(p) with
    zero-probability bins contributing 0)."""
    n = latent.shape[0]
    sym = jnp.round(jnp.clip(latent, 0.0, 1.0) * (levels - 1)).astype(jnp.int32)
    flat = sym.reshape(n, -1)
    m = flat.shape[1]

    def per_item(row):
        counts = jax.ops.segment_sum(jnp.ones_like(row), row, num_segments=levels)
        p = counts / m
        return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)), 0.0))

    return jax.vmap(per_item)(flat)


def latent_visualization(sym: np.ndarray) -> np.ndarray:
    """uint8 latent symbols [h,w,3C] -> the packed [4h, 8Cw/32... ] image the
    reference saves as val_encoded.png (the same raw-reshape pack used for
    the bitstream, reference tf2_0/src/models.py:252-254)."""
    from neural_network_image_compression_tpu.ops.pack import pack_planes

    return np.asarray(pack_planes(jnp.asarray(sym[None])))[0]


def side_by_side(original: np.ndarray, reconstruction: np.ndarray) -> np.ndarray:
    """[H,W,3] x2 -> [H, 2W+8, 3] comparison strip (val_comparison.png,
    reference tf2_0/src/models.py:256-260)."""
    h, w, c = original.shape
    gap = np.zeros((h, 8, c), np.uint8)
    return np.concatenate([original, gap, reconstruction], axis=1)

"""Colorspace transforms as a single fused 3x3 matmul over the channel axis.

Capability parity with the reference's ``convert_to_colourspace``/
``convert_to_rgb`` (reference tf2_0/src/utils.py:64-77), which splits the image
into three [N,H,W,1] tensors and does nine scalar multiplies. On TPU we keep
the planes stacked as [..., 3] and let XLA fuse one einsum against a 3x3
constant — one VPU pass, no splits, no concats.

Constants match the reference exactly (tf2_0/src/utils.py:7-13): a full-range
JPEG-style YCbCr matrix with [0, 0.5, 0.5] offsets, plus the (unused-by-the-
reference but defined) PCA-like basis.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Colorspace(NamedTuple):
    name: str
    kernel: np.ndarray      # [3,3] forward: planes = kernel @ rgb
    inv_kernel: np.ndarray  # [3,3] inverse
    offsets: np.ndarray     # [3] added after forward projection


def _make(name: str, kernel: np.ndarray, offsets: np.ndarray) -> Colorspace:
    kernel = np.asarray(kernel, np.float64)
    return Colorspace(
        name=name,
        kernel=kernel.astype(np.float32),
        inv_kernel=np.linalg.inv(kernel).astype(np.float32),
        offsets=np.asarray(offsets, np.float32),
    )


# Reference constants: tf2_0/src/utils.py:7-9 (full-range JPEG YCbCr).
YCBCR = _make(
    "ycbcr",
    [[0.299, 0.587, 0.114],
     [-0.16874, -0.33126, 0.5],
     [0.5, -0.41869, -0.08131]],
    [0.0, 0.5, 0.5],
)

# Reference constants: tf2_0/src/utils.py:11-13 (defined but never applied
# by the reference; exposed here as a first-class pluggable basis).
PCA = _make(
    "pca",
    [[1 / 3, 1 / 3, 1 / 3],
     [-0.5, 0.0, 0.5],
     [0.25, -0.5, 0.25]],
    [0.0, 0.5, 0.5],
)

_SPACES = {cs.name: cs for cs in (YCBCR, PCA)}


def get_colorspace(name: str) -> Colorspace:
    try:
        return _SPACES[name]
    except KeyError:
        raise ValueError(f"unknown colorspace {name!r}; choose from {sorted(_SPACES)}")


def rgb_to_planes(x: jnp.ndarray, cs: Colorspace = YCBCR) -> jnp.ndarray:
    """[..., 3] RGB in [0,1] -> [..., 3] colour planes (offsets applied).

    precision=HIGHEST: on TPU the default einsum precision routes through
    bfloat16 MXU passes (~4e-3 error); the colorspace transform sits on the
    quantizer boundary and must stay exact in float32.
    """
    return jnp.einsum(
        "...c,kc->...k",
        x,
        jnp.asarray(cs.kernel),
        precision=jax.lax.Precision.HIGHEST,
    ) + jnp.asarray(cs.offsets)


def planes_to_rgb(x: jnp.ndarray, cs: Colorspace = YCBCR) -> jnp.ndarray:
    """[..., 3] colour planes -> [..., 3] RGB (un-clipped)."""
    return jnp.einsum(
        "...c,kc->...k",
        x - jnp.asarray(cs.offsets),
        jnp.asarray(cs.inv_kernel),
        precision=jax.lax.Precision.HIGHEST,
    )

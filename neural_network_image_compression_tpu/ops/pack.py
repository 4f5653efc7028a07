"""Latent <-> packed-image bijections.

The reference's on-disk compressed format is an optimized PNG of the packed
uint8 latent: each colour plane's [N,h,w,32] latent is *raw row-major
reshaped* to [N,4h,8w,1] (reference tf2_0/src/utils.py:38-40, and the shape
arithmetic [1, 4, 8, 1/32] at tf2_0/src/training.py:15), and the three plane
packs are concatenated on the channel axis into an [N,4h,8w,3] image.

Note this is a plain ``reshape`` — NOT a channels-to-space/depth-to-space
shuffle. We reproduce the exact bijection so that (a) PNG-parity mode produces
byte-identical packed images and (b) pack/unpack round-trips bitwise.
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_latent(latent: jnp.ndarray, factors: tuple[int, int] = (4, 8)) -> jnp.ndarray:
    """[N,h,w,C] -> [N,h*r0,w*r1,1] raw row-major reshape (C == r0*r1)."""
    n, h, w, c = latent.shape
    r0, r1 = factors
    if c != r0 * r1:
        raise ValueError(f"channels {c} != {r0}*{r1}")
    return latent.reshape(n, h * r0, w * r1, 1)


def unpack_latent(packed: jnp.ndarray, factors: tuple[int, int] = (4, 8)) -> jnp.ndarray:
    """Inverse of :func:`pack_latent`: [N,H,W,1] -> [N,H/r0,W/r1,r0*r1]."""
    n, hh, ww, c = packed.shape
    r0, r1 = factors
    if c != 1 or hh % r0 or ww % r1:
        raise ValueError(f"bad packed shape {packed.shape} for factors {factors}")
    return packed.reshape(n, hh // r0, ww // r1, r0 * r1)


def pack_planes(latents: jnp.ndarray, factors: tuple[int, int] = (4, 8)) -> jnp.ndarray:
    """[N,h,w,3*C] (Y|Cb|Cr latents concatenated) -> [N,h*r0,w*r1,3] image.

    Mirrors reference tf2_0/src/utils.py:38-40: per-plane raw reshape then
    channel-axis concat.
    """
    n, h, w, c3 = latents.shape
    c = c3 // 3
    planes = [
        pack_latent(latents[..., i * c : (i + 1) * c], factors) for i in range(3)
    ]
    return jnp.concatenate(planes, axis=3)


def unpack_planes(packed: jnp.ndarray, factors: tuple[int, int] = (4, 8)) -> jnp.ndarray:
    """Inverse of :func:`pack_planes` (reference tf2_0/src/utils.py:35-36)."""
    plane_latents = [
        unpack_latent(packed[..., i : i + 1], factors) for i in range(packed.shape[3])
    ]
    return jnp.concatenate(plane_latents, axis=3)

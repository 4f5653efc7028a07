"""Mean-scale hyperprior rate model (Ballé et al. 2018 / Minnen et al. 2018).

The factorized density cannot see per-position variance structure; the
checkerboard context (models/entropy.py) sees spatial neighbours. The
hyperprior is the third, orthogonal mechanism the reference era lacks: a tiny
side latent ``z`` (16x fewer elements than the main latent) is transmitted
first and decoded into a per-position conditional Gaussian (mean, scale) for
EVERY main-latent element — no anchors, one dense conditional pass.

All convs are full-grid and feed-forward, so encode and decode each stay one
jitted TPU program (no autoregressive scan), like the checkerboard.

Geometry contract (shared by training and the coding path, coding/
codec_stream.py): the hyper-encoder consumes the main latent NORMALIZED to
~unit range (symbol units minus the grid centre, divided by the codec's
density span); ``z`` lives on its own integer symbol grid with the same
``levels`` as the main latent and is coded by a dedicated
FactorizedEntropyModel.

Reference parity note: the reference has no analogue (its rate model is a
scalar CNN regressor, tf2_0/src/training.py:25-42); this module exists for
the north-star target of beating the reference's PNG/DEFLATE coder.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _softplus_inv(y: float) -> float:
    return float(np.log(np.expm1(y)))


def head_geometry(
    raw: jnp.ndarray,
    levels: int,
    mean_span: float,
    scale_init: float,
    scale_min: float,
    scale_max: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared (mean, scale) geometry of every conditional head.

    ``raw`` [..., 2C] is the zero-initialized final conv's output: the first
    C channels are the mean offset (symbol units = center + off * mean_span),
    the last C the raw scale (sigma = clipped softplus shifted so raw 0 =>
    scale_init). Splitting this out of the modules lets the joint context
    consume the hyper head's RAW features (which the fixed-point twin in
    coding/detnet.py can reproduce exactly) while anchors use the derived
    (mean, scale)."""
    mean_off, raw_scale = jnp.split(raw, 2, axis=-1)
    center = (levels - 1) / 2.0
    mean = center + mean_off * mean_span
    scale = jnp.clip(
        jax.nn.softplus(raw_scale + _softplus_inv(scale_init)),
        scale_min,
        scale_max,
    )
    return mean, scale


class HyperEncoder(nn.Module):
    """Normalized main latent [N,h,w,C] -> continuous hyper latent
    [N,ceil(h/4),ceil(w/4),zc] in symbol units (unbounded, integer grid)."""

    hidden: int = 96
    z_channels: int = 16

    @nn.compact
    def __call__(self, y_norm: jnp.ndarray) -> jnp.ndarray:
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        x = act(nn.Conv(self.hidden, (3, 3), padding="SAME", name="h1")(
            jnp.abs(y_norm)
        ))
        x = act(nn.Conv(self.hidden, (5, 5), strides=(2, 2), padding="SAME",
                        name="h2")(x))
        return nn.Conv(self.z_channels, (5, 5), strides=(2, 2), padding="SAME",
                       name="h3")(x)


class HyperDecoder(nn.Module):
    """Hyper latent (noisy/decoded, symbol units) -> per-position conditional
    Gaussian (mean, scale) over the MAIN latent's symbol grid."""

    channels: int            # main latent channels
    hidden: int = 96
    levels: int = 256
    scale_min: float = 0.11
    scale_max: float = 256.0
    mean_span: float = 16.0  # symbol units per unit of the mean head output
    scale_init: float = 8.0
    z_span: float = 16.0     # input normalization of the hyper latent

    @nn.compact
    def raw(self, z_sym_units: jnp.ndarray,
            out_hw: tuple[int, int]) -> jnp.ndarray:
        """Raw 2C-channel head output (pre-geometry); the joint context's
        conditioning features and the det twin's exact target."""
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        x = z_sym_units / self.z_span
        x = act(nn.ConvTranspose(self.hidden, (5, 5), strides=(2, 2),
                                 padding="SAME", name="hd1")(x))
        x = act(nn.ConvTranspose(self.hidden, (5, 5), strides=(2, 2),
                                 padding="SAME", name="hd2")(x))
        # SAME-padded stride-2 transposes produce 2*ceil(h/2); crop to the
        # main latent grid (odd sizes).
        x = x[:, : out_hw[0], : out_hw[1], :]
        return nn.Conv(2 * self.channels, (3, 3), padding="SAME", name="hd3",
                       kernel_init=nn.initializers.zeros)(x)

    def __call__(self, z_sym_units: jnp.ndarray,
                 out_hw: tuple[int, int]) -> tuple[jnp.ndarray, jnp.ndarray]:
        return head_geometry(
            self.raw(z_sym_units, out_hw),
            self.levels, self.mean_span, self.scale_init,
            self.scale_min, self.scale_max,
        )


def hyper_grid_hw(lat_hw: tuple[int, int]) -> tuple[int, int]:
    """Hyper-latent spatial dims for a main-latent grid (two SAME stride-2
    convs): ceil(ceil(h/2)/2). Shared by encode and decode so the z-stream
    length is implied by the container's lat dims."""
    h, w = lat_hw
    h2 = -(-h // 2)
    w2 = -(-w // 2)
    return -(-h2 // 2), -(-w2 // 2)

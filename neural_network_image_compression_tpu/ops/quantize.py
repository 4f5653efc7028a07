"""Scalar quantization of the latent — two grids.

``grid='unit'`` (reference-parity): the latent is clipped to [0,1] and
quantized to ``levels`` uniform steps, exactly the reference's
``round(encoded*255).astype(uint8)`` at inference (tf2_0/src/encoder.py:47)
with the additive-noise training surrogate ``y + U(-.5,.5)/255`` then clip
(tf2_0/src/training.py:87-88).

``grid='integer'`` (TPU-native default since round 2): the latent is
UNBOUNDED and lives directly in symbol units; quantization is plain
``round(y)`` with a +levels/2 storage offset so symbols still fit uint8 and
the packed-latent PNG parity path keeps working. This is the standard
variational-codec formulation (Ballé et al. 2018): bin width 1, training
surrogate ``y + U(-.5,.5)`` with NO clip, so the rate term's gradient reaches
the encoder everywhere and the R-D λ genuinely controls the operating point —
the clipped unit grid saturates near-uniform over its 256 levels and pins the
rate (~8 bpp) regardless of λ.

Also provides a straight-through estimator (``ste_round``) — the modern
surrogate the reference lacks — and symbol-domain helpers for the entropy
coder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize(y: jnp.ndarray, levels: int = 256, grid: str = "unit") -> jnp.ndarray:
    """Latent -> integer symbols in [0, levels-1] (uint8 for levels<=256).

    unit: clipped [0,1] latent scaled by (levels-1) and rounded.
    integer: round(y) + levels//2, clipped to the symbol range (the training
    rate penalty keeps |y| far inside it; the pmf folds tail mass into the
    edge symbols so edge values remain codable)."""
    if grid == "integer":
        sym = jnp.clip(jnp.round(y) + levels // 2, 0, levels - 1)
    else:
        sym = jnp.round(jnp.clip(y, 0.0, 1.0) * float(levels - 1))
    return sym.astype(jnp.uint8 if levels <= 256 else jnp.int32)


def dequantize(sym: jnp.ndarray, levels: int = 256, grid: str = "unit") -> jnp.ndarray:
    """Integer symbols -> float latent (unit: [0,1]; integer: centered units)."""
    if grid == "integer":
        return sym.astype(jnp.float32) - float(levels // 2)
    return sym.astype(jnp.float32) / float(levels - 1)


def to_symbol_units(y: jnp.ndarray, levels: int = 256, grid: str = "unit") -> jnp.ndarray:
    """Continuous latent -> continuous position on the [0, levels-1] symbol
    grid (what the entropy models consume during training)."""
    if grid == "integer":
        return y + float(levels // 2)
    return y * float(levels - 1)


def noise_surrogate(
    y: jnp.ndarray, key: jax.Array, levels: int = 256, grid: str = "unit"
) -> jnp.ndarray:
    """Training-time quantization surrogate: additive uniform noise of one
    quantization bin (reference tf2_0/src/training.py:87-88). The unit grid
    clips (matching the reference); the integer grid must NOT clip — the
    unbounded surrogate is what lets rate gradients reach the encoder."""
    noise = jax.random.uniform(key, y.shape, minval=-0.5, maxval=0.5)
    if grid == "integer":
        return y + noise
    return jnp.clip(y + noise / float(levels - 1), 0.0, 1.0)


def ste_round(y: jnp.ndarray, levels: int = 256, grid: str = "unit") -> jnp.ndarray:
    """Straight-through rounding: forward = real quantize-dequantize,
    backward = identity. (No reference analogue; SURVEY.md section 7 item 5.)"""
    if grid == "integer":
        return y + jax.lax.stop_gradient(jnp.round(y) - y)
    scale = float(levels - 1)
    yc = jnp.clip(y, 0.0, 1.0)
    rounded = jnp.round(yc * scale) / scale
    return yc + jax.lax.stop_gradient(rounded - yc)

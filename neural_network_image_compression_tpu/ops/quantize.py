"""Uniform 256-level scalar quantization of the clipped latent.

Parity: reference quantizes with ``round(encoded*255).astype(uint8)`` at
inference (tf2_0/src/encoder.py:47) and trains through it with an additive
uniform-noise surrogate ``y + U(-.5,.5)/255`` then clip (tf2_0/src/
training.py:87-88). Here we additionally provide a straight-through estimator
(``ste_round``) — the modern surrogate the reference lacks — and symbol-domain
helpers used by the entropy coder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize(y: jnp.ndarray, levels: int = 256) -> jnp.ndarray:
    """Clipped [0,1] latent -> integer symbols in [0, levels-1] (uint8 for 256)."""
    scale = float(levels - 1)
    sym = jnp.round(jnp.clip(y, 0.0, 1.0) * scale)
    return sym.astype(jnp.uint8 if levels <= 256 else jnp.int32)


def dequantize(sym: jnp.ndarray, levels: int = 256) -> jnp.ndarray:
    """Integer symbols -> float latent in [0,1]."""
    return sym.astype(jnp.float32) / float(levels - 1)


def noise_surrogate(y: jnp.ndarray, key: jax.Array, levels: int = 256) -> jnp.ndarray:
    """Training-time quantization surrogate: additive uniform noise of one
    quantization bin, then clip (reference tf2_0/src/training.py:87-88)."""
    noise = jax.random.uniform(key, y.shape, minval=-0.5, maxval=0.5)
    return jnp.clip(y + noise / float(levels - 1), 0.0, 1.0)


def ste_round(y: jnp.ndarray, levels: int = 256) -> jnp.ndarray:
    """Straight-through rounding: forward = real quantize-dequantize,
    backward = identity. (No reference analogue; SURVEY.md section 7 item 5.)"""
    scale = float(levels - 1)
    yc = jnp.clip(y, 0.0, 1.0)
    rounded = jnp.round(yc * scale) / scale
    return yc + jax.lax.stop_gradient(rounded - yc)

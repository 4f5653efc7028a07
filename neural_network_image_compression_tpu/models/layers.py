"""Shared layers for the codec transforms.

TPU notes: all convs are NHWC and map onto XLA convolution, which tiles onto
the MXU; activations fuse into the conv epilogue. ``compute_dtype='bfloat16'``
casts inputs/params for the conv compute while keeping parameter storage (and
the numerically sensitive clip/quantize boundary) in float32.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """Per-channel parametric ReLU, alpha initialised to ``init`` —
    the reference tf1_13 activation (tf1_13/src/utils.py:17-25)."""

    init: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init), (x.shape[-1],), jnp.float32
        )
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def make_activation(kind: str, slope: float = 0.2, prelu_init: float = 0.2):
    """Activation factory. 'leaky_relu' matches TF's default alpha=0.2
    (used throughout reference tf2_0/src/encoder.py:10-17); 'prelu' matches
    tf1_13. Returns a callable applied post-conv."""
    if kind == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if kind == "prelu":
        return PReLU(init=prelu_init)
    if kind == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {kind!r}")

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.ops import (
    dequantize,
    noise_surrogate,
    quantize,
    ste_round,
)


def test_quantize_round_trip_on_grid():
    grid = jnp.arange(256, dtype=jnp.float32) / 255.0
    sym = quantize(grid)
    assert sym.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(sym), np.arange(256, dtype=np.uint8))
    np.testing.assert_allclose(np.asarray(dequantize(sym)), np.asarray(grid), atol=1e-7)


def test_quantize_matches_reference_rule(rng):
    """round(x*255).astype(uint8), after clip (reference tf2_0/src/encoder.py:47)."""
    x = rng.random((100,)).astype(np.float32) * 1.4 - 0.2
    sym = np.asarray(quantize(jnp.asarray(x)))
    expected = np.round(np.clip(x, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(sym, expected)


def test_noise_surrogate_bounds(rng):
    x = jnp.asarray(rng.random((1000,)).astype(np.float32))
    noisy = noise_surrogate(x, jax.random.key(0))
    delta = np.abs(np.asarray(noisy) - np.asarray(x))
    assert delta.max() <= 0.5 / 255 + 1e-7
    assert np.asarray(noisy).min() >= 0 and np.asarray(noisy).max() <= 1


def test_ste_round_forward_and_gradient():
    x = jnp.asarray([0.1234, 0.5, 0.9999])
    fwd = np.asarray(ste_round(x))
    np.testing.assert_allclose(fwd, np.round(np.asarray(x) * 255) / 255, atol=1e-7)
    g = jax.grad(lambda v: jnp.sum(ste_round(v)))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(3), atol=1e-6)

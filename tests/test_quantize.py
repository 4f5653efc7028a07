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


# ------------------------------------------------------- integer symbol grid


def test_integer_grid_round_trip():
    y = jnp.asarray([-3.2, -0.4, 0.0, 0.49, 5.8])
    sym = quantize(y, grid="integer")
    assert sym.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(sym), [125, 128, 128, 128, 134])
    np.testing.assert_allclose(
        np.asarray(dequantize(sym, grid="integer")), [-3, 0, 0, 0, 6], atol=0
    )


def test_integer_grid_clips_to_symbol_range():
    y = jnp.asarray([-1000.0, 1000.0])
    sym = np.asarray(quantize(y, grid="integer"))
    np.testing.assert_array_equal(sym, [0, 255])


def test_integer_noise_surrogate_is_unclipped(rng):
    """The whole point of the integer grid: the surrogate must NOT clip, so
    rate gradients reach the encoder at every operating point."""
    x = jnp.asarray(rng.standard_normal(1000).astype(np.float32) * 50)
    noisy = np.asarray(noise_surrogate(x, jax.random.key(0), grid="integer"))
    delta = np.abs(noisy - np.asarray(x))
    assert delta.max() <= 0.5 + 1e-6
    assert noisy.min() < -1.0 and noisy.max() > 1.0  # unbounded


def test_integer_ste_round():
    x = jnp.asarray([-2.4, 0.3, 7.5001])
    fwd = np.asarray(ste_round(x, grid="integer"))
    np.testing.assert_allclose(fwd, [-2.0, 0.0, 8.0], atol=1e-6)
    g = jax.grad(lambda v: jnp.sum(ste_round(v, grid="integer")))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(3), atol=1e-6)


def test_symbol_units_match_quantize():
    """to_symbol_units(y) must land on the same grid quantize() rounds to,
    for both grids, so training and coding share one symbol geometry."""
    from neural_network_image_compression_tpu.ops.quantize import to_symbol_units

    y_unit = jnp.asarray([0.0, 0.25, 1.0])
    np.testing.assert_allclose(
        np.asarray(to_symbol_units(y_unit)),
        np.asarray(quantize(y_unit)).astype(np.float32),
        atol=0.5,
    )
    y_int = jnp.asarray([-4.0, 0.0, 3.0])
    np.testing.assert_array_equal(
        np.asarray(to_symbol_units(y_int, grid="integer")),
        np.asarray(quantize(y_int, grid="integer")).astype(np.float32),
    )

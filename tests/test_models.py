import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.config import Config, ModelConfig
from neural_network_image_compression_tpu.models import (
    AnalysisTransform,
    EntropyRegressor,
    FactorizedEntropyModel,
    SynthesisTransform,
)


@pytest.mark.parametrize("preset,ds", [("base", 8), ("deep", 16)])
def test_transform_shapes(preset, ds):
    analysis = AnalysisTransform(preset=preset)
    synthesis = SynthesisTransform(preset=preset)
    x = jnp.zeros((2, 128, 128, 1))
    params_a = analysis.init(jax.random.key(0), x)["params"]
    lat = analysis.apply(params := {"params": params_a}, x)
    assert lat.shape == (2, 128 // ds, 128 // ds, 32)
    assert float(lat.min()) >= 0.0 and float(lat.max()) <= 1.0
    params_s = synthesis.init(jax.random.key(1), lat)["params"]
    out = synthesis.apply({"params": params_s}, lat)
    assert out.shape == (2, 128, 128, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_deep_preset_has_prelu_params():
    analysis = AnalysisTransform(preset="deep")
    params = analysis.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))["params"]
    assert "act1" in params and "alpha" in params["act1"]
    np.testing.assert_allclose(np.asarray(params["act1"]["alpha"]), 0.2)


def test_base_preset_param_structure():
    analysis = AnalysisTransform(preset="base")
    params = analysis.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))["params"]
    assert set(params) == {"conv1", "conv2", "conv3", "conv4", "conv8"}


def test_transform_arbitrary_sizes():
    analysis = AnalysisTransform(preset="base")
    params = analysis.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))["params"]
    lat = analysis.apply({"params": params}, jnp.zeros((1, 512, 768, 1)))
    assert lat.shape == (1, 64, 96, 32)


def test_bfloat16_compute_close_to_f32(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    a32 = AnalysisTransform(preset="base", compute_dtype="float32")
    a16 = AnalysisTransform(preset="base", compute_dtype="bfloat16")
    params = a32.init(jax.random.key(0), x)["params"]
    y32 = np.asarray(a32.apply({"params": params}, x))
    y16 = np.asarray(a16.apply({"params": params}, x))
    assert y16.dtype == np.float32  # output is cast back for the clip boundary
    assert np.abs(y32 - y16).mean() < 0.01


def test_entropy_regressor_shape_and_clip(rng):
    model = EntropyRegressor()
    x = jnp.asarray(rng.random((3, 16, 16, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    out = np.asarray(model.apply({"params": params}, x))
    assert out.shape == (3, 1)
    assert out.min() >= 0.0 and out.max() <= 8.0


def test_factorized_pmf_sums_to_one():
    model = FactorizedEntropyModel(channels=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2, 2, 4)))["params"]
    pmf = np.asarray(
        model.apply({"params": params}, method=FactorizedEntropyModel.pmf)
    )
    assert pmf.shape == (4, 256)
    assert (pmf >= 0).all()
    np.testing.assert_allclose(pmf.sum(axis=1), np.ones(4), atol=1e-4)


def test_factorized_bits_positive_and_consistent(rng):
    model = FactorizedEntropyModel(channels=8)
    z = jnp.asarray(rng.integers(0, 256, (2, 4, 4, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), z)["params"]
    bits = np.asarray(model.apply({"params": params}, z))
    assert bits.shape == (2, 4, 4, 8)
    assert (bits > 0).all()
    # bits at integer symbols must equal -log2(pmf[symbol]) up to tail folding
    pmf = np.asarray(model.apply({"params": params}, method=FactorizedEntropyModel.pmf))
    z_int = np.asarray(z).astype(int)
    for c in range(8):
        sel = (z_int[..., c] > 0) & (z_int[..., c] < 255)  # interior: no folding
        expected = -np.log2(pmf[c][z_int[..., c][sel]])
        np.testing.assert_allclose(bits[..., c][sel], expected, rtol=1e-3, atol=1e-3)


def test_factorized_is_differentiable(rng):
    model = FactorizedEntropyModel(channels=4)
    z = jnp.asarray(rng.random((1, 4, 4, 4)).astype(np.float32) * 255)
    params = model.init(jax.random.key(0), z)["params"]

    def loss(p, zz):
        return jnp.sum(model.apply({"params": p}, zz))

    gz = jax.grad(loss, argnums=1)(params, z)
    gp = jax.grad(loss, argnums=0)(params, z)
    assert np.isfinite(np.asarray(gz)).all()
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

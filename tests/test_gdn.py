"""GDN activation preset (models/layers.py GDN, model.activation='gdn').

Beyond-reference capability: the reference's topologies use leaky_relu
(tf2_0/src/encoder.py:10-17) / PReLU (tf1_13/src/utils.py:17-25); GDN is the
standard divisive-normalization upgrade for conv compression autoencoders.
These tests pin the layer math, the transform wiring (final stages stay
linear), training integration, and CLI/config plumbing.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    QuantizerConfig,
    TrainConfig,
)
from neural_network_image_compression_tpu.models import NeuralCodec
from neural_network_image_compression_tpu.models.autoencoder import (
    AnalysisTransform,
    SynthesisTransform,
)
from neural_network_image_compression_tpu.models.layers import GDN


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_gdn_math_and_inverse(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    gdn = GDN()
    params = gdn.init(jax.random.key(0), x)["params"]
    y = gdn.apply({"params": params}, x)
    # closed form with the initial parameters
    beta = 1e-6 + params["beta_sqrt"] ** 2
    gamma = params["gamma_sqrt"] ** 2
    norm = jnp.sqrt(beta + jnp.einsum("nhwj,ji->nhwi", x * x, gamma))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x / norm), rtol=1e-5)
    # the forward map strictly shrinks magnitudes when norm > 1 ... and the
    # inverse with the SAME stats recovers x exactly: IGDN(params, GDN_out)
    # is not an algebraic inverse, but x * norm / norm == x elementwise.
    igdn = GDN(inverse=True)
    z = igdn.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x * norm), rtol=1e-5)
    # GDN(0) == 0: spatial-tiling edge masks commute with the activation
    zero = jnp.zeros_like(x)
    np.testing.assert_array_equal(np.asarray(gdn.apply({"params": params}, zero)), 0.0)


def test_gdn_norm_positive_and_gradients_flow(rng):
    """Nonnegativity is by construction; the off-diagonal sqrt-params start
    small-positive precisely so their gradient is nonzero from step 1."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 6)).astype(np.float32) * 3)
    gdn = GDN()
    params = gdn.init(jax.random.key(1), x)["params"]

    def loss(p):
        return (gdn.apply({"params": p}, x) ** 2).sum()

    g = jax.grad(loss)(params)
    gg = np.asarray(g["gamma_sqrt"])
    offdiag = gg[~np.eye(gg.shape[0], dtype=bool)]
    assert np.abs(offdiag).max() > 0.0
    assert np.isfinite(gg).all()


@pytest.mark.parametrize("preset,ds", [("base", 8), ("deep", 16)])
def test_gdn_transform_shapes_and_params(preset, ds, rng):
    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    ana = AnalysisTransform(preset=preset, activation="gdn", clip_output=False)
    p = ana.init(jax.random.key(0), x)["params"]
    lat = ana.apply({"params": p}, x)
    assert lat.shape == (2, 32 // ds, 32 // ds, 32)
    # GDN params exist on inter-stage activations, NOT on the final stage
    names = set(p.keys())
    assert any(n.endswith("_gdn") for n in names)
    assert not any(n.startswith("act8") for n in names)

    syn = SynthesisTransform(preset=preset, activation="gdn", out_channels=1)
    sp = syn.init(jax.random.key(1), lat)["params"]
    out = syn.apply({"params": sp}, lat)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert any(n.endswith("_gdn") for n in sp.keys())


def _gdn_cfg():
    return Config(
        model=ModelConfig(clip_latent=False, activation="gdn"),
        quantizer=QuantizerConfig(grid="integer"),
        data=DataConfig(patch_size=16),
        train=TrainConfig(
            batch_size=4,
            max_epochs=1,
            val_every_steps=0,
            checkpoint_every_steps=0,
            log_every_steps=10_000,
        ),
    )


def test_gdn_train_step_and_rate_gradient(rng):
    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )

    cfg = _gdn_cfg()
    codec = NeuralCodec(cfg)
    state = init_train_state(codec, jax.random.key(0), cfg)
    step = jax.jit(make_train_step(codec, cfg))
    imgs = (rng.random((4, 16, 16, 3)) * 255).astype(np.uint8)
    s1, m1 = step(state, imgs, jax.random.key(1))
    s2, m2 = step(s1, imgs, jax.random.key(2))
    for k, v in m2.items():
        assert np.isfinite(float(v)), k
    # the GDN parameters themselves must receive gradient
    before = state.params["analysis_y"]["act1_gdn"]["gamma_sqrt"]
    after = s2.params["analysis_y"]["act1_gdn"]["gamma_sqrt"]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0


def test_gdn_lr_scale_partitions_updates(rng):
    """gdn_lr_scale must scale updates for GDN beta/gamma params ONLY (the
    targeted GDN+STE stabilizer, VERDICT r4 item 4)."""
    import dataclasses

    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )

    imgs = (rng.random((4, 16, 16, 3)) * 255).astype(np.uint8)

    def one_update(gdn_lr_scale):
        cfg = _gdn_cfg()
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, gdn_lr_scale=gdn_lr_scale),
        )
        codec = NeuralCodec(cfg)
        state = init_train_state(codec, jax.random.key(0), cfg)
        step = jax.jit(make_train_step(codec, cfg))
        s1, _ = step(state, imgs, jax.random.key(1))
        return state.params, s1.params

    p0, p1 = one_update(None)
    q0, q1 = one_update(0.0)  # scale 0: Adam of a zero-lr group
    # GDN params frozen under scale 0, moving under default
    moved = np.abs(
        np.asarray(p1["analysis_y"]["act1_gdn"]["gamma_sqrt"])
        - np.asarray(p0["analysis_y"]["act1_gdn"]["gamma_sqrt"])
    ).max()
    frozen = np.abs(
        np.asarray(q1["analysis_y"]["act1_gdn"]["gamma_sqrt"])
        - np.asarray(q0["analysis_y"]["act1_gdn"]["gamma_sqrt"])
    ).max()
    assert moved > 0
    assert frozen == 0
    # non-GDN params still move identically-nonzero in both
    conv_moved = np.abs(
        np.asarray(q1["analysis_y"]["conv1"]["kernel"])
        - np.asarray(q0["analysis_y"]["conv1"]["kernel"])
    ).max()
    assert conv_moved > 0


def test_ste_warmup_switches_surrogate():
    """ste_warmup_steps: noise surrogate before the threshold (stochastic in
    the key), exact STE rounding after it."""
    import dataclasses

    import jax.numpy as jnp

    from neural_network_image_compression_tpu.config import Config, QuantizerConfig, TrainConfig
    from neural_network_image_compression_tpu.ops.quantize import ste_round
    from neural_network_image_compression_tpu.training.train_step import _surrogate

    cfg = Config(
        quantizer=QuantizerConfig(grid="integer", surrogate="noise+ste"),
        train=TrainConfig(ste_warmup_steps=100),
    )
    lat = jnp.linspace(-3.0, 3.0, 64).reshape(1, 4, 4, 4)
    early = _surrogate(cfg, lat, jax.random.key(1), jnp.asarray(5))
    late = _surrogate(cfg, lat, jax.random.key(1), jnp.asarray(100))
    ste = ste_round(lat, cfg.quantizer.levels, "integer")
    assert np.allclose(np.asarray(late), np.asarray(ste))
    assert not np.allclose(np.asarray(early), np.asarray(ste))
    # early output is the noise surrogate: within half a bin of the latent
    assert np.abs(np.asarray(early - lat)).max() <= 0.5 + 1e-6


def test_gdn_round_trip_bitstream(rng):
    """Full encode -> rANS container -> decode with the GDN codec."""
    from neural_network_image_compression_tpu.coding.codec_stream import (
        compress_image,
        decompress_image,
    )

    cfg = _gdn_cfg()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0), (32, 48))
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    blob = compress_image(codec, params, img)
    recon = decompress_image(codec, params, blob)
    assert recon.shape == img.shape
    assert recon.dtype == np.uint8


def test_gdn_cli_and_config_round_trip():
    from neural_network_image_compression_tpu.cli import _build_config
    import argparse

    args = argparse.Namespace(
        reference_faithful=False,
        tpu_native=True,
        data="d",
        val="v",
        preset="base",
        compute_dtype=None,
        activation="gdn",
        entropy_context=None,
        surrogate=None,
        batch_size=8,
        epochs=1,
        rd_lambda=0.01,
        rd_lambda_step=0.0,
        distortion="ssim",
        bitstream=None,
        freeze_transforms=False,
        val_every_steps=None,
    )
    cfg = _build_config(args)
    assert cfg.model.activation == "gdn"
    # JSON round-trip preserves the field
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.model.activation == "gdn"


def test_explicit_native_activation_keeps_pallas():
    """--activation leaky_relu on the base preset IS the preset default;
    an explicitly requested pallas backend must not silently fall back."""
    cfg = Config(model=ModelConfig(backend="pallas", activation="leaky_relu"))
    codec = NeuralCodec(cfg)
    assert codec._pallas_compatible_activation()
    cfg2 = Config(
        model=ModelConfig(preset="deep", backend="pallas", activation="prelu")
    )
    assert NeuralCodec(cfg2)._pallas_compatible_activation()
    # cross-preset override -> XLA
    cfg3 = Config(model=ModelConfig(preset="deep", activation="leaky_relu"))
    assert not NeuralCodec(cfg3)._pallas_compatible_activation()
    # GDN on the base preset IS pallas-servable (inter-stage gdn_apply);
    # on the deep preset it still falls back to XLA
    cfg4 = Config(model=ModelConfig(activation="gdn"))
    assert NeuralCodec(cfg4)._pallas_compatible_activation()
    cfg5 = Config(model=ModelConfig(preset="deep", activation="gdn"))
    assert not NeuralCodec(cfg5)._pallas_compatible_activation()


def test_gdn_pallas_backend_matches_xla(rng):
    """backend='pallas' on a GDN codec routes through the fused kernels with
    inter-stage gdn_apply and must reproduce the XLA path's symbols."""
    cfg = _gdn_cfg()
    pcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backend="pallas")
    )
    xcodec = NeuralCodec(cfg)
    pcodec = NeuralCodec(pcfg)
    params = xcodec.init(jax.random.key(0), (16, 16))
    img = (rng.random((1, 16, 16, 3)) * 255).astype(np.uint8)
    sym_x = np.asarray(xcodec.encode(params, img))
    sym_p = np.asarray(pcodec.encode(params, img))
    diff = sym_p.astype(np.int32) - sym_x.astype(np.int32)
    assert int((diff != 0).sum()) <= 2 and np.abs(diff).max() <= 1
    out_x = np.asarray(xcodec.decode(params, sym_x, out_hw=(16, 16)))
    out_p = np.asarray(pcodec.decode(params, sym_x, out_hw=(16, 16)))
    diff = out_p.astype(np.int32) - out_x.astype(np.int32)
    assert int((diff != 0).sum()) <= 4 and (diff == 0).all() or np.abs(diff).max() <= 1

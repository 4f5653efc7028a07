"""Joint (hyperprior + checkerboard) context: training rate path, the
three-pass bitstream round-trip, adaptive z tables, and the deterministic
fixed-point twins. No reference analogue (the reference's rate model is a
scalar CNN regressor, tf2_0/src/training.py:25-42; its coder is PNG/DEFLATE,
tf2_0/src/utils.py:87) — this is the framework's strongest entropy model:
anchors get the hyper Gaussian (replacing the checkerboard mode's static
factorized tables), non-anchors a context net over [decoded anchors ++ raw
hyper features]."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.coding.codec_stream import (
    compress_symbols,
    decompress_image,
)
from neural_network_image_compression_tpu.coding.container import (
    unpack_container,
)
from neural_network_image_compression_tpu.config import (
    Config,
    DataConfig,
    EntropyConfig,
    ModelConfig,
    QuantizerConfig,
    TrainConfig,
)
from neural_network_image_compression_tpu.models import NeuralCodec


def _joint_cfg(**entropy_overrides):
    ent = dict(context="joint")
    ent.update(entropy_overrides)
    return Config(
        model=ModelConfig(clip_latent=False),
        entropy=EntropyConfig(**ent),
        quantizer=QuantizerConfig(grid="integer"),
    )


def _perturb(params, scale=0.05, seed=7):
    """Give the zero-init conditional heads real weights so mean/scale vary."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    out = [
        np.asarray(l) + rng.normal(0, scale, np.shape(l)).astype(np.float32)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def joint_codec():
    cfg = _joint_cfg()
    codec = NeuralCodec(cfg)
    params = _perturb(codec.init(jax.random.key(0), (64, 64)))
    return codec, params


def test_param_groups_exist(joint_codec):
    codec, params = joint_codec
    for g in (
        "context_y", "context_c",
        "hyper_enc_y", "hyper_enc_c", "hyper_dec_y", "hyper_dec_c",
        "hyper_entropy_y", "hyper_entropy_c",
    ):
        assert g in params, g
    # The context net conditions on anchors (C) ++ raw hyper head (2C).
    k = params["context_y"]["ctx1"]["kernel"]
    assert k.shape[2] == 3 * codec.latent_channels


def test_plane_rate_bits_includes_side_info(joint_codec, rng):
    codec, params = joint_codec
    z_sym = jnp.asarray(rng.normal(128, 3, (2, 8, 12, 32)).astype(np.float32))
    total = codec.plane_rate_bits(params, "y", z_sym, jax.random.key(1))
    assert total.shape == (2,)
    assert np.all(np.isfinite(np.asarray(total)))
    # Strictly greater than the main conditional bits alone (z is transmitted).
    from neural_network_image_compression_tpu.models.entropy import (
        checkerboard_mask,
        conditional_gaussian_bits,
    )

    z = codec.hyper_z(params, "y", z_sym)
    raw = codec.hyper_raw(params, "y", z, (8, 12))
    mh, sh, mj, sj = codec.joint_conditionals(params, "y", z_sym, raw)
    mask = checkerboard_mask(8, 12)
    main_only = jnp.sum(
        conditional_gaussian_bits(z_sym, mh, sh) * mask
        + conditional_gaussian_bits(z_sym, mj, sj) * (1.0 - mask),
        axis=(1, 2, 3),
    )
    assert np.all(np.asarray(total) > np.asarray(main_only))


def test_plane_bits_raises(joint_codec):
    codec, params = joint_codec
    z = jnp.full((1, 4, 4, 32), 128.0)
    with pytest.raises(TypeError):
        codec.plane_bits(params, "y", z)


def test_joint_bitstream_round_trip_bit_exact(joint_codec, rng, jit_forward):
    codec, params = joint_codec
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    sym = np.asarray(codec.encode(params, rgb[None]))[0]
    blob = compress_symbols(codec, params, sym, rgb.shape[:2], mode="rans")
    header, streams = unpack_container(blob)
    assert header.joint and header.hyper
    assert header.passes == 3 and len(streams) == 9
    recon = decompress_image(codec, params, blob)
    direct = jit_forward(codec, params, rgb)
    np.testing.assert_array_equal(recon, direct)


def test_joint_odd_latent_grid(joint_codec, rng, jit_forward):
    """Odd latent grids exercise the hyper-decoder crop and the uneven
    anchor/non-anchor split."""
    codec, params = joint_codec
    rgb = rng.integers(0, 256, (72, 104, 3), dtype=np.uint8)  # lat 9x13
    blob = compress_symbols(
        codec, params, np.asarray(codec.encode(params, rgb[None]))[0],
        rgb.shape[:2], mode="rans",
    )
    recon = decompress_image(codec, params, blob)
    direct = jit_forward(codec, params, rgb)
    np.testing.assert_array_equal(recon, direct)


def test_joint_adaptive_z_tables(joint_codec, rng):
    """adaptive_tables embeds per-image z tables -> passes 4, and the
    container stays self-describing (decode without model tables)."""
    codec, params = joint_codec
    cfg = codec.cfg.replace(
        entropy=dataclasses.replace(codec.cfg.entropy, adaptive_tables=True)
    )
    acodec = NeuralCodec(cfg)
    rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    sym = np.asarray(codec.encode(params, rgb[None]))[0]
    blob = compress_symbols(acodec, params, sym, rgb.shape[:2], mode="rans")
    header, _ = unpack_container(blob)
    assert header.joint
    if header.adaptive:
        assert header.passes == 4
        # self-describing: the z streams decode from embedded tables only
        acodec.pmf_tables = acodec.hyper_pmf_tables = lambda *a: (_ for _ in ()).throw(
            AssertionError("model tables evaluated for adaptive container")
        )
    rec = decompress_image(acodec, params, blob)
    from neural_network_image_compression_tpu.coding.codec_stream import (
        jitted_codec_fns,
    )

    _, dec = jitted_codec_fns(acodec)
    ref = np.asarray(dec(params, sym[None], out_hw=rgb.shape[:2]))[0]
    np.testing.assert_array_equal(rec, ref)


class TestDet:
    def _det_codec(self, codec):
        cfg = codec.cfg.replace(
            codec=dataclasses.replace(codec.cfg.codec, deterministic=True)
        )
        return NeuralCodec(cfg)

    def test_det_stage_parity(self, joint_codec, rng):
        """Fixed-point twins track the float stages (quantization moves a
        conditional by at most one mean step / one scale bin almost always)."""
        from neural_network_image_compression_tpu.coding import detnet
        from neural_network_image_compression_tpu.coding.codec_stream import (
            _joint_stage1,
            _joint_stage2,
        )

        codec, params = joint_codec
        zc = codec.cfg.entropy.hyper_channels
        z_sym = rng.integers(112, 144, (3, 4, 3 * zc)).astype(np.uint8)
        mu_f, idx_f, raw_f = _joint_stage1(codec, params, z_sym, (9, 13), False)
        mu_d, idx_d, raw_d = detnet.det_joint_hyper(codec, params, z_sym, (9, 13))
        assert mu_d.shape == mu_f.shape and raw_d.shape[-1] == 6 * codec.latent_channels
        assert (np.abs(mu_d - mu_f) <= 1).mean() > 0.999
        assert (np.abs(idx_d - idx_f) <= 1).mean() > 0.999
        sym = rng.integers(100, 156, (9, 13, 3 * codec.latent_channels)).astype(np.uint8)
        mu2_f, idx2_f = _joint_stage2(codec, params, sym, raw_f, False)
        mu2_d, idx2_d = detnet.det_joint_ctx(codec, params, sym, raw_d)
        assert (np.abs(mu2_d - mu2_f) <= 1).mean() > 0.99
        assert (np.abs(idx2_d - idx2_f) <= 1).mean() > 0.99

    def test_det_round_trip_and_no_model_tables(self, joint_codec, rng):
        codec, params = joint_codec
        det_codec = self._det_codec(codec)

        def boom(*a, **k):
            raise AssertionError("JAX model-table evaluation in det path")

        det_codec.pmf_tables = boom
        det_codec.hyper_pmf_tables = boom
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(det_codec, params, sym, rgb.shape[:2], mode="rans")
        header, _ = unpack_container(blob)
        assert header.det and header.joint and header.adaptive
        assert header.passes == 4
        rec = decompress_image(det_codec, params, blob)
        assert rec.shape == rgb.shape


def test_joint_flag_rejected_by_old_readers(joint_codec, rng, monkeypatch):
    """A pre-bit6 reader must refuse joint containers cleanly (the stream
    layout differs), not misparse them."""
    from neural_network_image_compression_tpu.coding import container

    codec, params = joint_codec
    rgb = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    sym = np.asarray(codec.encode(params, rgb[None]))[0]
    blob = compress_symbols(codec, params, sym, rgb.shape[:2], mode="rans")
    monkeypatch.setattr(container, "_KNOWN_FLAGS", 0b111111)
    with pytest.raises(ValueError, match="unknown flag"):
        unpack_container(blob)


def test_joint_lambda_controls_rate():
    """The joint training path must collapse rate under a big lambda."""
    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )

    imgs = (np.random.default_rng(7).random((4, 16, 16, 3)) * 255).astype(
        np.uint8
    )

    def run(lam):
        cfg = _joint_cfg().replace(
            data=DataConfig(patch_size=16),
            train=TrainConfig(
                batch_size=4, rd_lambda=lam, rd_lambda_step=0.0,
                learning_rate=1e-3, distortion="mse",
                val_every_steps=0, checkpoint_every_steps=0,
                log_every_steps=10_000,
            ),
        )
        codec = NeuralCodec(cfg)
        state = init_train_state(codec, jax.random.key(0), cfg)
        step = jax.jit(make_train_step(codec, cfg))
        key = jax.random.key(5)
        # 300 steps: the joint path's rate gradient flows through the zero-
        # init hyper AND context heads, so it needs more steps than the
        # single-conditional models to separate cleanly (measured margin at
        # 300: high/low = 0.79).
        for _ in range(300):
            key, sub = jax.random.split(key)
            state, metrics = step(state, imgs, sub)
        return float(metrics["bpp_y"]) + float(metrics["bpp_cb"])

    high = run(10.0)
    low = run(0.0)
    assert np.isfinite(high) and np.isfinite(low)
    assert high < 0.9 * low, (high, low)

"""Deterministic fixed-point conditional inference (coding/detnet.py).

The float context/hyper nets make two-pass bitstreams platform-locked (the
decoder must reproduce the encoder's float conv results bit-for-bit); the
det path replaces them with exact integer arithmetic, so these tests pin:
geometry parity with the float modules, bit-exact round-trips through the
full container path, layout-independence of the integer math, and a bounded
rate cost. No reference analogue (the reference's coder is PNG/DEFLATE,
tf2_0/src/utils.py:87)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.coding import detnet
from neural_network_image_compression_tpu.coding.codec_stream import (
    _ctx_mu_idx,
    _hyper_mu_idx,
    build_tables,
    compress_symbols,
    decompress_image,
)
from neural_network_image_compression_tpu.coding.container import unpack_container
from neural_network_image_compression_tpu.config import tpu_native
from neural_network_image_compression_tpu.models import NeuralCodec


def _perturb(params, scale=0.05, seed=7):
    """Give the zero-init context heads real weights so conditionals vary."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    out = [
        np.asarray(l) + rng.normal(0, scale, np.shape(l)).astype(np.float32)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def ctx_codec():
    cfg = tpu_native()
    codec = NeuralCodec(cfg)
    params = _perturb(codec.init(jax.random.key(0), (64, 64)))
    return codec, params


@pytest.fixture(scope="module")
def hyper_codec():
    cfg = tpu_native()
    cfg = dataclasses.replace(
        cfg, entropy=dataclasses.replace(cfg.entropy, context="hyperprior",
                                         adaptive_tables=False)
    )
    codec = NeuralCodec(cfg)
    params = _perturb(codec.init(jax.random.key(0), (64, 64)))
    return codec, params


def _det_cfg(codec):
    return dataclasses.replace(
        codec.cfg, codec=dataclasses.replace(codec.cfg.codec, deterministic=True)
    )


class TestFixedPointPrimitives:
    def test_conv_transpose_geometry_matches_flax(self):
        import flax.linen as nn

        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.5, (5, 7, 3)).astype(np.float32)
        m = nn.ConvTranspose(4, (5, 5), strides=(2, 2), padding="SAME")
        p = m.init(jax.random.key(1), x[None])["params"]
        y_ref = np.asarray(m.apply({"params": p}, x[None]))[0]
        kq, bq = detnet._quantize_conv(p)
        xq = np.rint(x.astype(np.float64) * 2.0 ** detnet.FA)
        yq = detnet.conv_transpose_s2_fixed(xq, kq, bq)
        assert yq.shape == y_ref.shape
        np.testing.assert_allclose(
            yq / 2.0 ** detnet.FA, y_ref, atol=3e-3
        )

    def test_conv_same_matches_flax(self):
        import flax.linen as nn

        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.5, (6, 9, 4)).astype(np.float32)
        m = nn.Conv(5, (5, 5), padding="SAME")
        p = m.init(jax.random.key(2), x[None])["params"]
        y_ref = np.asarray(m.apply({"params": p}, x[None]))[0]
        kq, bq = detnet._quantize_conv(p)
        xq = np.rint(x.astype(np.float64) * 2.0 ** detnet.FA)
        yq = detnet.conv_same_fixed(xq, kq, bq)
        np.testing.assert_allclose(yq / 2.0 ** detnet.FA, y_ref, atol=3e-3)

    def test_leaky_slope_exact(self):
        x = np.array([-65536.0, -3.0, 0.0, 5.0])
        y = detnet.leaky_fixed(x)
        assert y[0] == -13107.0  # floor(-65536 * 13107 / 65536)
        assert y[2] == 0.0 and y[3] == 5.0

    def test_overflow_guard(self):
        k = np.full((3, 3, 1, 1), 2.0 ** 30)
        b = np.zeros(1)
        x = np.full((4, 4, 1), 2.0 ** 30)
        with pytest.raises(detnet.DetOverflowError):
            detnet.conv_same_fixed(x, k, b)


class TestDetContext:
    def test_mu_idx_close_to_float_path(self, ctx_codec):
        codec, params = ctx_codec
        rng = np.random.default_rng(3)
        sym = rng.integers(96, 160, (8, 10, 3 * codec.latent_channels)).astype(
            np.uint8
        )
        mu_f, idx_f = _ctx_mu_idx(codec, params, sym, det=False)
        mu_d, idx_d = _ctx_mu_idx(codec, params, sym, det=True)
        assert mu_d.shape == mu_f.shape and idx_d.shape == idx_f.shape
        # Fixed point perturbs each prediction by ~2**-14; only values within
        # a hair of a rounding/bin boundary may flip.
        assert (np.abs(mu_d - mu_f) <= 1).mean() > 0.999
        assert (np.abs(idx_d - idx_f) <= 1).mean() > 0.999

    def test_layout_independence(self, ctx_codec):
        codec, params = ctx_codec
        rng = np.random.default_rng(4)
        sym = rng.integers(0, 256, (6, 8, 3 * codec.latent_channels)).astype(
            np.uint8
        )
        mu_c, idx_c = detnet.det_context_params(codec, params, sym)
        sym_f = np.asfortranarray(sym)
        codec._det_tables = None  # force table rebuild
        mu_f, idx_f = detnet.det_context_params(codec, params, sym_f)
        np.testing.assert_array_equal(mu_c, mu_f)
        np.testing.assert_array_equal(idx_c, idx_f)

    def test_container_roundtrip_det(self, ctx_codec):
        codec, params = ctx_codec
        det_codec = NeuralCodec(_det_cfg(codec))
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(det_codec, params, sym, rgb.shape[:2],
                                mode="rans")
        header, _ = unpack_container(blob)
        assert header.det and header.adaptive and header.passes == 3
        # decode through the public path (reads det from the container)
        rec = decompress_image(det_codec, params, blob)
        assert rec.shape == rgb.shape  # CRC inside decompress proves symbols

    def test_det_never_evaluates_model_tables(self, ctx_codec):
        # The actual cross-platform guarantee (ADVICE r2): no stream in a det
        # container may depend on codec.pmf_tables — a JAX float evaluation
        # whose results differ across XLA backends. Poison it on both sides.
        codec, params = ctx_codec
        det_codec = NeuralCodec(_det_cfg(codec))

        def boom(*a, **k):
            raise AssertionError("JAX model-table evaluation in det path")

        det_codec.pmf_tables = boom
        det_codec.hyper_pmf_tables = boom
        rng = np.random.default_rng(15)
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(det_codec, params, sym, rgb.shape[:2],
                                mode="rans")
        rec = decompress_image(det_codec, params, blob)
        assert rec.shape == rgb.shape

    def test_rate_cost_small(self, ctx_codec):
        codec, params = ctx_codec
        det_codec = NeuralCodec(_det_cfg(codec))
        rng = np.random.default_rng(6)
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        tables = build_tables(codec, params)
        b_float = compress_symbols(codec, params, sym, rgb.shape[:2], tables,
                                   mode="rans")
        b_det = compress_symbols(det_codec, params, sym, rgb.shape[:2], tables,
                                 mode="rans")
        assert len(b_det) < len(b_float) * 1.02


class TestDetHyper:
    def test_mu_idx_close_to_float_path(self, hyper_codec):
        codec, params = hyper_codec
        rng = np.random.default_rng(8)
        zc = codec.cfg.entropy.hyper_channels
        z_sym = rng.integers(112, 144, (3, 4, 3 * zc)).astype(np.uint8)
        mu_f, idx_f = _hyper_mu_idx(codec, params, z_sym, (9, 13), det=False)
        mu_d, idx_d = _hyper_mu_idx(codec, params, z_sym, (9, 13), det=True)
        assert mu_d.shape == mu_f.shape
        assert (np.abs(mu_d - mu_f) <= 1).mean() > 0.999
        assert (np.abs(idx_d - idx_f) <= 1).mean() > 0.999

    def test_container_roundtrip_det(self, hyper_codec):
        codec, params = hyper_codec
        det_codec = NeuralCodec(_det_cfg(codec))
        rng = np.random.default_rng(9)
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(det_codec, params, sym, rgb.shape[:2],
                                mode="rans")
        header, _ = unpack_container(blob)
        assert header.det and header.hyper
        # det hyper containers embed the z tables (adaptive+hyper): the z
        # streams must not depend on the JAX-evaluated hyper factorized CDFs
        assert header.adaptive and header.passes == 3
        rec = decompress_image(det_codec, params, blob)
        assert rec.shape == rgb.shape

    def test_det_never_evaluates_model_tables(self, hyper_codec):
        codec, params = hyper_codec
        det_codec = NeuralCodec(_det_cfg(codec))

        def boom(*a, **k):
            raise AssertionError("JAX model-table evaluation in det path")

        det_codec.pmf_tables = boom
        det_codec.hyper_pmf_tables = boom
        rng = np.random.default_rng(16)
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(det_codec, params, sym, rgb.shape[:2],
                                mode="rans")
        rec = decompress_image(det_codec, params, blob)
        assert rec.shape == rgb.shape

    def test_hyper_adaptive_decision_roundtrip(self, hyper_codec):
        # Non-det hyperprior with adaptive_tables: the encoder embeds z
        # tables only when that shrinks the container; decode must handle
        # whichever branch was taken.
        codec, params = hyper_codec
        cfg = dataclasses.replace(
            codec.cfg,
            entropy=dataclasses.replace(codec.cfg.entropy, adaptive_tables=True),
        )
        acodec = NeuralCodec(cfg)
        rng = np.random.default_rng(17)
        rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(acodec, params, sym, rgb.shape[:2], mode="rans")
        rec = decompress_image(acodec, params, blob)
        assert rec.shape == rgb.shape


class TestContainerFlag:
    def test_det_flag_rejected_by_old_reader(self, ctx_codec, monkeypatch):
        # A det container must not be parseable by a reader that doesn't know
        # bit5: build a real det container, shrink the reader's known-flag
        # set to the pre-bit5 value, and require a loud refusal.
        from neural_network_image_compression_tpu.coding import container

        codec, params = ctx_codec
        det_codec = NeuralCodec(_det_cfg(codec))
        rng = np.random.default_rng(18)
        rgb = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        sym = np.asarray(codec.encode(params, rgb[None]))[0]
        blob = compress_symbols(det_codec, params, sym, rgb.shape[:2],
                                mode="rans")
        header, _ = unpack_container(blob)
        assert header.det  # precondition: bit5 actually set in the blob
        monkeypatch.setattr(container, "_KNOWN_FLAGS", 0b11111)
        with pytest.raises(ValueError, match="unknown flag"):
            container.unpack_container(blob)


class TestDeepPresetDet:
    def test_deep_preset_joint_det_roundtrip(self, rng):
        """The det twins cover the entropy-side nets only (context/hyper),
        which are preset-independent 5x5/3x3 stacks — so a DEEP-preset codec
        with the joint context must det-round-trip like the base preset
        (VERDICT r4 item 7: no silent topology assumption)."""
        from neural_network_image_compression_tpu.coding.codec_stream import (
            compress_image,
        )
        from neural_network_image_compression_tpu.config import tpu_native

        cfg = tpu_native()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, preset="deep"),
            entropy=dataclasses.replace(cfg.entropy, context="joint"),
            codec=dataclasses.replace(cfg.codec, deterministic=True),
        )
        codec = NeuralCodec(cfg)
        params = _perturb(codec.init(jax.random.key(2), (64, 64)))
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        blob = compress_image(codec, params, img)
        hdr, _ = unpack_container(blob)
        assert hdr.det and hdr.joint
        out = decompress_image(codec, params, blob)
        assert out.shape == img.shape  # CRC inside decompress proves symbols

    def test_transposed_kernel_guard_is_loud(self):
        """Non-5x5 transposed kernels refuse with a clear message instead of
        silently computing wrong geometry (detnet.py pad rule is derived for
        the shipped hyper topology only)."""
        x = np.zeros((4, 4, 2))
        k = np.zeros((3, 3, 2, 2))
        b = np.zeros(2)
        with pytest.raises(NotImplementedError, match="5x5 stride-2"):
            detnet.conv_transpose_s2_fixed(x, k, b)

"""Pallas kernel parity tests (interpret mode on CPU; real execution is
exercised on TPU by benchmarks/pallas_bench.py)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.models import (
    AnalysisTransform,
    FactorizedEntropyModel,
    SynthesisTransform,
)
from neural_network_image_compression_tpu.ops import pallas_conv as pc
from neural_network_image_compression_tpu.ops.pallas_entropy import (
    factorized_bits_pallas,
)


def test_core_kernel_matches_lax(rng):
    x = jnp.asarray(rng.standard_normal((2, 18, 20, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    out = pc.conv3x3_valid_fused(x, w, b, slope=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_residual_epilogue_orders(rng):
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.zeros((8,))
    res = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    act = lambda v: jnp.where(v >= 0, v, 0.2 * v)
    # after-act residual (reference base preset: x = act(conv(x)) + res)
    out = pc.conv3x3_valid_fused(
        x, w, b, res, slope=0.2, add_before_act=False, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(act(conv) + res), atol=1e-5)
    # before-act residual (reference deep preset: x = act(conv + res))
    out2 = pc.conv3x3_valid_fused(
        x, w, b, res, slope=0.2, add_before_act=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(act(conv + res)), atol=1e-5)


def test_conv5x5_s2_matches_flax(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)).astype(np.float32))
    conv = nn.Conv(8, (5, 5), strides=(2, 2), padding="SAME")
    p = conv.init(jax.random.key(0), x)["params"]
    ref = nn.leaky_relu(conv.apply({"params": p}, x), negative_slope=0.2)
    out = pc.conv5x5_s2_fused(x, p["kernel"], p["bias"], slope=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv_transpose5x5_s2_matches_flax(rng):
    x = jnp.asarray(rng.standard_normal((1, 10, 12, 6)).astype(np.float32))
    convt = nn.ConvTranspose(4, (5, 5), strides=(2, 2), padding="SAME")
    p = convt.init(jax.random.key(1), x)["params"]
    ref = nn.leaky_relu(convt.apply({"params": p}, x), negative_slope=0.2)
    out = pc.conv_transpose5x5_s2_fused(
        x, p["kernel"], p["bias"], slope=0.2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_analysis_base_parity(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    ana = AnalysisTransform(preset="base")
    p = ana.init(jax.random.key(0), x)["params"]
    ref = ana.apply({"params": p}, x)
    out = pc.pallas_analysis_base(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tap_concat_parity(rng):
    """The tap-concat contraction ([TH*W, 9*Cin] @ [9*Cin, Cout] single
    matmul) must match the per-tap path bit-for-tolerance on every operator
    shape the transforms use: padded cin (16), residual, s2 conv, s2
    transpose."""
    x = jnp.asarray(rng.standard_normal((2, 18, 20, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    base = pc.conv3x3_valid_fused(x, w, b, slope=0.2, interpret=True)
    tap = pc.conv3x3_valid_fused(x, w, b, slope=0.2, interpret=True,
                                 tap_concat=True)
    np.testing.assert_allclose(np.asarray(tap), np.asarray(base), atol=1e-5)

    res = jnp.asarray(rng.standard_normal((2, 16, 18, 8)).astype(np.float32))
    base = pc.conv3x3_valid_fused(x, w, b, res, slope=0.2, interpret=True)
    tap = pc.conv3x3_valid_fused(x, w, b, res, slope=0.2, interpret=True,
                                 tap_concat=True)
    np.testing.assert_allclose(np.asarray(tap), np.asarray(base), atol=1e-5)

    xs = jnp.asarray(rng.standard_normal((1, 32, 48, 3)).astype(np.float32))
    ws = jnp.asarray(rng.standard_normal((5, 5, 3, 8)).astype(np.float32) * 0.1)
    base = pc.conv5x5_s2_fused(xs, ws, b, slope=0.2, interpret=True)
    tap = pc.conv5x5_s2_fused(xs, ws, b, slope=0.2, interpret=True,
                              tap_concat=True)
    np.testing.assert_allclose(np.asarray(tap), np.asarray(base), atol=1e-5)

    xt = jnp.asarray(rng.standard_normal((1, 10, 12, 6)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal((5, 5, 6, 4)).astype(np.float32) * 0.1)
    bt = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    base = pc.conv_transpose5x5_s2_fused(xt, wt, bt, slope=0.2, interpret=True)
    tap = pc.conv_transpose5x5_s2_fused(xt, wt, bt, slope=0.2, interpret=True,
                                        tap_concat=True)
    np.testing.assert_allclose(np.asarray(tap), np.asarray(base), atol=1e-5)


def test_pallas_synthesis_base_parity(rng):
    lat = jnp.asarray(rng.random((1, 8, 8, 32)).astype(np.float32))
    syn = SynthesisTransform(preset="base")
    p = syn.init(jax.random.key(1), lat)["params"]
    ref = syn.apply({"params": p}, lat)
    out = pc.pallas_synthesis_base(p, lat, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_quantization_boundary_consistency(rng):
    """Pallas and XLA paths must quantize to the same symbols (the float
    tolerance must not flip rounded values — SURVEY.md hard part 3)."""
    from neural_network_image_compression_tpu.ops.quantize import quantize

    x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    ana = AnalysisTransform(preset="base")
    p = ana.init(jax.random.key(2), x)["params"]
    sym_ref = np.asarray(quantize(ana.apply({"params": p}, x)))
    sym_pal = np.asarray(quantize(pc.pallas_analysis_base(p, x, interpret=True)))
    mismatch = (sym_ref != sym_pal).mean()
    assert mismatch < 2e-3, f"{mismatch:.4%} of symbols flipped"


def test_factorized_bits_pallas_parity(rng):
    model = FactorizedEntropyModel(channels=32)
    z = jnp.asarray(rng.random((2, 6, 7, 32)).astype(np.float32) * 255)
    params = model.init(jax.random.key(0), z)["params"]
    ref = model.apply({"params": params}, z)
    out = factorized_bits_pallas(z, params, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_analysis_deep_parity(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    ana = AnalysisTransform(preset="deep")
    p = ana.init(jax.random.key(3), x)["params"]
    ref = ana.apply({"params": p}, x)
    out = pc.pallas_analysis_deep(p, x, interpret=True)
    assert out.shape == ref.shape == (1, 4, 4, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_synthesis_deep_parity(rng):
    lat = jnp.asarray(rng.random((1, 4, 4, 32)).astype(np.float32))
    syn = SynthesisTransform(preset="deep")
    p = syn.init(jax.random.key(4), lat)["params"]
    ref = syn.apply({"params": p}, lat)
    out = pc.pallas_synthesis_deep(p, lat, interpret=True)
    assert out.shape == ref.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_bf16_parity(rng):
    x = jnp.asarray(rng.random((1, 64, 72, 1)).astype(np.float32)).astype(jnp.bfloat16)
    ana = AnalysisTransform(preset="base", compute_dtype="bfloat16")
    p = ana.init(jax.random.key(5), x)["params"]
    ref = ana.apply({"params": p}, x)
    out = pc.pallas_analysis_base(p, x.astype(jnp.bfloat16), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_estimated_bpp_production_api(rng):
    """codec.estimated_bpp — the production wiring of the entropy kernel
    (on TPU it runs ops/pallas_entropy.py; on CPU the XLA chain) — must
    equal the XLA factorized bits sum."""
    from neural_network_image_compression_tpu.config import tpu_native
    from neural_network_image_compression_tpu.models import NeuralCodec

    cfg = tpu_native()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0), (32, 48))
    img = rng.integers(0, 256, (1, 32, 48, 3)).astype(np.uint8)
    sym = codec.encode(params, jnp.asarray(img))
    est = codec.estimated_bpp(params, sym, 32 * 48)
    z = sym.astype(jnp.float32)
    cch = codec.latent_channels
    by = codec.entropy_y.apply({"params": params["entropy_y"]}, z[..., :cch])
    zc = jnp.concatenate([z[..., cch:2*cch], z[..., 2*cch:]], axis=0)
    bc = codec.entropy_c.apply({"params": params["entropy_c"]}, zc)
    want = (by.sum() + bc.sum()) / (32 * 48)
    np.testing.assert_allclose(float(est[0]), float(want), rtol=1e-4)


def test_pallas_gdn_analysis_parity(rng):
    """GDN on the Pallas conv path (inter-stage gdn_apply) vs the Flax
    transform with activation='gdn' — the flagship's activation must be
    servable from the fused kernels (VERDICT r3 items 2/5)."""
    x = jnp.asarray(rng.random((1, 32, 40, 1)).astype(np.float32))
    ana = AnalysisTransform(preset="base", activation="gdn", clip_output=False)
    p = ana.init(jax.random.key(6), x)["params"]
    ref = ana.apply({"params": p}, x)
    out = pc.pallas_analysis_base(p, x, clip=False, gdn=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_gdn_synthesis_parity(rng):
    lat = jnp.asarray(rng.random((1, 4, 6, 32)).astype(np.float32))
    syn = SynthesisTransform(preset="base", activation="gdn")
    p = syn.init(jax.random.key(7), lat)["params"]
    ref = syn.apply({"params": p}, lat)
    out = pc.pallas_synthesis_base(p, lat, clip=True, gdn=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_mask_parity(rng):
    """The spatial-tiling per-stage mask interposed between Pallas kernels
    must match the Flax path's column_mask placement (VERDICT r3 item 8:
    Pallas under tiling)."""
    x = jnp.asarray(rng.random((1, 32, 40, 1)).astype(np.float32))

    def mask(v, scale):
        w = v.shape[2]
        cols = jnp.arange(w).reshape(1, 1, w, 1)
        keep = cols < (w - 2)  # pretend the last 2 columns are padding
        return jnp.where(keep, v, jnp.zeros_like(v))

    ana = AnalysisTransform(preset="base", clip_output=False)
    p = ana.init(jax.random.key(8), x)["params"]
    ref = ana.apply({"params": p}, x, mask)
    out = pc.pallas_analysis_base(p, x, clip=False, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    lat = jnp.asarray(rng.random((1, 4, 8, 32)).astype(np.float32))
    syn = SynthesisTransform(preset="base")
    ps = syn.init(jax.random.key(9), lat)["params"]
    refs = syn.apply({"params": ps}, lat, mask)
    outs = pc.pallas_synthesis_base(ps, lat, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(refs), atol=1e-5)


def test_tiled_encode_pallas_backend(rng):
    """End-to-end: spatial tiling with backend='pallas' (interpret on CPU)
    must match the whole-image XLA encode — the tiled path no longer
    excludes the kernels (codec.py previously required column_mask None)."""
    import dataclasses

    from neural_network_image_compression_tpu.config import Config
    from neural_network_image_compression_tpu.models import NeuralCodec
    from neural_network_image_compression_tpu.parallel import (
        make_mesh,
        tiled_encode,
    )

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backend="pallas")
    )
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    rgb = rng.integers(0, 256, (1, 64, 128, 3)).astype(np.uint8)
    xla_codec = NeuralCodec(Config())
    whole = np.asarray(xla_codec.encode(params, jnp.asarray(rgb)))
    mesh = make_mesh(data=1, spatial=2)
    tiled = np.asarray(tiled_encode(codec, params, jnp.asarray(rgb), mesh))
    diff = tiled.astype(np.int32) - whole.astype(np.int32)
    mismatch = int((diff != 0).sum())
    assert mismatch <= 4, f"{mismatch} symbols differ"
    assert mismatch == 0 or np.abs(diff).max() <= 1

import jax
import numpy as np
import pytest

from neural_network_image_compression_tpu.config import Config, ModelConfig
from neural_network_image_compression_tpu.models import NeuralCodec


@pytest.fixture(scope="module")
def codec_and_params():
    cfg = Config()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    return codec, params


def test_encode_shapes(codec_and_params, rng):
    codec, params = codec_and_params
    rgb = rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    sym = codec.encode(params, rgb)
    assert sym.shape == (2, 16, 16, 96)
    assert sym.dtype == np.uint8


def test_decode_shapes(codec_and_params, rng):
    codec, params = codec_and_params
    sym = rng.integers(0, 256, (2, 16, 16, 96), dtype=np.uint8)
    rgb = codec.decode(params, sym)
    assert rgb.shape == (2, 128, 128, 3)
    assert rgb.dtype == np.uint8


def test_forward_round_trip_jits(codec_and_params, rng):
    codec, params = codec_and_params
    fwd = jax.jit(codec.forward)
    rgb = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    out = np.asarray(fwd(params, rgb))
    assert out.shape == rgb.shape and out.dtype == np.uint8


def test_non_multiple_sizes_pad_and_crop(codec_and_params, rng):
    codec, params = codec_and_params
    rgb = rng.integers(0, 256, (1, 100, 130, 3), dtype=np.uint8)
    sym = codec.encode(params, rgb)
    assert sym.shape == (1, 13, 17, 96)  # ceil(100/8), ceil(130/8)
    out = codec.decode(params, sym, out_hw=(100, 130))
    assert out.shape == (1, 100, 130, 3)


def test_chroma_weight_sharing(codec_and_params):
    """Cb and Cr go through the same 'analysis_c' params — the reference's
    dual-model scheme (tf2_0/src/utils.py:19-24)."""
    codec, params = codec_and_params
    assert set(params) >= {"analysis_y", "analysis_c", "synthesis_y", "synthesis_c"}
    # A gray image has Cb == Cr, so their latents must be identical.
    gray = np.full((1, 64, 64, 3), 128, dtype=np.uint8)
    sym = np.asarray(codec.encode(params, gray))
    np.testing.assert_array_equal(sym[..., 32:64], sym[..., 64:96])


def test_latent_bits_shape(codec_and_params, rng):
    codec, params = codec_and_params
    z = np.asarray(rng.random((2, 8, 8, 96)).astype(np.float32) * 255)
    bits = codec.latent_bits(params, z)
    assert bits.shape == (2, 8, 8, 96)
    assert np.isfinite(np.asarray(bits)).all()


def test_pmf_tables(codec_and_params):
    codec, params = codec_and_params
    pmf_y, pmf_c = codec.pmf_tables(params)
    assert pmf_y.shape == (32, 256) and pmf_c.shape == (32, 256)
    np.testing.assert_allclose(np.asarray(pmf_y).sum(axis=1), 1.0, atol=1e-4)


# ----------------------------------------------- integer-grid (tpu_native)


@pytest.fixture(scope="module")
def int_codec_and_params():
    import dataclasses

    from neural_network_image_compression_tpu.config import tpu_native

    cfg = tpu_native()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    return codec, params


def test_integer_grid_requires_unclipped_latent():
    import dataclasses

    from neural_network_image_compression_tpu.config import tpu_native

    cfg = tpu_native()
    bad = cfg.replace(model=dataclasses.replace(cfg.model, clip_latent=True))
    with pytest.raises(ValueError, match="clip_latent"):
        NeuralCodec(bad)


def test_integer_grid_encode_decode_round_trip(int_codec_and_params, rng):
    codec, params = int_codec_and_params
    rgb = rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    sym = codec.encode(params, rgb)
    assert sym.shape == (2, 16, 16, 96)
    assert sym.dtype == np.uint8
    out = codec.decode(params, sym, out_hw=(128, 128))
    assert out.shape == (2, 128, 128, 3)
    # fresh init: latents near zero => symbols near the 128 offset
    s = np.asarray(sym).astype(np.int32)
    assert abs(s.mean() - 128) < 32


def test_integer_grid_bitstream_round_trip(int_codec_and_params, rng):
    """compress->decompress through the rANS+checkerboard container must be
    bit-exact on the integer grid (same property as the unit grid)."""
    from neural_network_image_compression_tpu.coding import (
        compress_image,
        decompress_image,
    )

    codec, params = int_codec_and_params
    rgb = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    blob = compress_image(codec, params, rgb)
    recon = decompress_image(codec, params, blob)
    direct = np.asarray(codec.forward(params, rgb[None]))[0]
    np.testing.assert_array_equal(recon, direct)

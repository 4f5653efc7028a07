"""Per-image adaptive CDF tables (coding/adaptive.py) and their container
wiring — the learned codec's dynamic-Huffman analogue."""
import dataclasses

import jax
import numpy as np
import pytest

from neural_network_image_compression_tpu.coding import rans
from neural_network_image_compression_tpu.coding.adaptive import (
    count_cdf,
    deserialize_cdf,
    plane_histogram_cdf,
    serialize_cdf,
)


def test_count_cdf_keeps_zeros_and_sums_exact():
    counts = np.array([[0, 10, 0, 30, 0, 0, 1, 0]])
    cdf = count_cdf(counts, precision=16)
    freqs = np.diff(cdf[0].astype(np.int64))
    assert freqs.sum() == 1 << 16
    assert (freqs[counts[0] == 0] == 0).all()
    assert (freqs[counts[0] > 0] >= 1).all()
    # apportionment tracks the empirical distribution
    np.testing.assert_allclose(freqs[3] / freqs[1], 3.0, rtol=0.01)


def test_serialize_round_trip(rng):
    counts = rng.integers(0, 50, (32, 256))
    counts[:, :100] = 0
    counts[:, 200:] = 0
    counts[:, 128] += 1000  # ensure every channel non-empty and peaky
    cdf = count_cdf(counts, 16)
    blob = serialize_cdf(cdf, 16)
    back = deserialize_cdf(blob, 32, 256, 16)
    np.testing.assert_array_equal(cdf, back)


def test_serialize_single_symbol_channel():
    counts = np.zeros((2, 256), np.int64)
    counts[0, 128] = 7
    counts[1, 3] = 1
    counts[1, 250] = 1
    cdf = count_cdf(counts, 16)
    blob = serialize_cdf(cdf, 16)
    back = deserialize_cdf(blob, 2, 256, 16)
    np.testing.assert_array_equal(cdf, back)
    freqs0 = np.diff(back[0].astype(np.int64))
    assert freqs0[128] == 1 << 16


def test_adaptive_rans_round_trip(rng):
    """Symbols coded with exact per-image tables decode bit-exactly and cost
    close to the empirical entropy."""
    sym = np.clip(np.round(rng.normal(128, 2, (16, 24, 32))), 0, 255).astype(
        np.uint8
    )
    cdf = plane_histogram_cdf(sym, 256, 16)
    blob = rans.encode(sym, cdf, 16)
    out = rans.decode(blob, sym.size, cdf, 16).reshape(sym.shape)
    np.testing.assert_array_equal(out, sym)
    # empirical entropy bound (+ coder flush slack)
    ent_bits = 0.0
    flat = sym.reshape(-1, 32)
    for c in range(32):
        _, counts = np.unique(flat[:, c], return_counts=True)
        p = counts / counts.sum()
        ent_bits += -(counts * np.log2(p)).sum()
    assert 8 * len(blob) < ent_bits * 1.05 + 64 * 8


def test_container_round_trip_adaptive_ctx(rng, jit_forward):
    """Flagship path: integer grid + checkerboard + adaptive tables — the
    container self-describes (flag bit3) and decodes bit-exactly."""
    from neural_network_image_compression_tpu.coding import (
        compress_image,
        decompress_image,
    )
    from neural_network_image_compression_tpu.coding.container import (
        unpack_container,
    )
    from neural_network_image_compression_tpu.config import tpu_native
    from neural_network_image_compression_tpu.models import NeuralCodec

    cfg = tpu_native()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    assert cfg.entropy.adaptive_tables
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    blob = compress_image(codec, params, rgb)
    header, streams = unpack_container(blob)
    assert header.adaptive and header.passes == 3 and len(streams) == 9
    recon = decompress_image(codec, params, blob)
    direct = jit_forward(codec, params, rgb)
    np.testing.assert_array_equal(recon, direct)


def test_container_round_trip_adaptive_no_ctx(rng, jit_forward):
    from neural_network_image_compression_tpu.coding import (
        compress_image,
        decompress_image,
    )
    from neural_network_image_compression_tpu.coding.container import (
        unpack_container,
    )
    from neural_network_image_compression_tpu.config import (
        Config,
        EntropyConfig,
    )
    from neural_network_image_compression_tpu.models import NeuralCodec

    cfg = Config(entropy=EntropyConfig(adaptive_tables=True))
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    # Low-variance image, big enough that exact tables beat the untrained
    # static density (the encoder only emits them when they win).
    rgb = (rng.random((256, 320, 3)) * 12 + 110).astype(np.uint8)
    blob = compress_image(codec, params, rgb)
    header, streams = unpack_container(blob)
    assert header.adaptive and header.passes == 2 and len(streams) == 6
    recon = decompress_image(codec, params, blob)
    direct = jit_forward(codec, params, rgb)
    np.testing.assert_array_equal(recon, direct)


def test_adaptive_never_larger_than_static(rng):
    """The encoder emits per-image tables only when they shrink the
    container, so the adaptive config can never lose to the static one."""
    from neural_network_image_compression_tpu.coding import compress_image
    from neural_network_image_compression_tpu.config import (
        Config,
        EntropyConfig,
    )
    from neural_network_image_compression_tpu.models import NeuralCodec

    cfg_static = Config()
    cfg_adapt = Config(entropy=EntropyConfig(adaptive_tables=True))
    codec_s = NeuralCodec(cfg_static)
    codec_a = NeuralCodec(cfg_adapt)
    params = codec_s.init(jax.random.key(0))
    rgb = (rng.random((64, 64, 3)) * 30 + 100).astype(np.uint8)  # low-variance
    blob_s = compress_image(codec_s, params, rgb)
    blob_a = compress_image(codec_a, params, rgb)
    # encoder-side decision: adaptive containers are never larger than static
    assert len(blob_a) <= len(blob_s)


def test_tiled_bitstream_adaptive_and_hyper(rng):
    """Tiled containers with per-tile adaptive tables round-trip bit-exactly
    — including for hyperprior codecs, whose static factorized tables are
    untrained (adaptive per-tile histograms are the only sane rate there)."""
    import jax.numpy as jnp

    from neural_network_image_compression_tpu.config import (
        Config,
        EntropyConfig,
        ModelConfig,
        QuantizerConfig,
    )
    from neural_network_image_compression_tpu.models import NeuralCodec
    from neural_network_image_compression_tpu.parallel import (
        compress_image_tiled,
        decompress_image_tiled,
        make_mesh,
    )

    mesh = make_mesh(data=1, spatial=4)
    for ctx in ("none", "hyperprior"):
        cfg = Config(
            model=ModelConfig(clip_latent=False),
            entropy=EntropyConfig(context=ctx, adaptive_tables=True),
            quantizer=QuantizerConfig(grid="integer"),
        )
        codec = NeuralCodec(cfg)
        params = codec.init(jax.random.key(0))
        rgb = rng.integers(0, 256, (64, 256, 3), dtype=np.uint8)
        blob = compress_image_tiled(codec, params, rgb, mesh)
        out = decompress_image_tiled(codec, params, blob, mesh)
        whole_sym = np.asarray(codec.encode(params, rgb[None]))
        whole = np.asarray(codec.decode(params, whole_sym, out_hw=(64, 256)))[0]
        np.testing.assert_array_equal(out, whole)

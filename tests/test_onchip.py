"""Fused batched serving path (coding/onchip.py).

The contract under test: compress_batch writes ordinary 'lane' containers —
byte-identical to the per-image path with the same coder, decodable one at a
time by decompress_image — and decompress_batch reproduces per-image decode
exactly. This is the bit-compatibility that lets the serving fast path and
the archival path interoperate.
"""
import dataclasses

import jax
import numpy as np
import pytest

from neural_network_image_compression_tpu.coding import (
    build_tables,
    compress_batch,
    compress_image,
    decompress_batch,
    decompress_image,
)
from neural_network_image_compression_tpu.coding.container import unpack_container
from neural_network_image_compression_tpu.config import Config, tpu_native
from neural_network_image_compression_tpu.models import NeuralCodec


def _codec(context: str):
    cfg = tpu_native() if context == "checkerboard" else Config()
    cfg = cfg.replace(
        codec=dataclasses.replace(cfg.codec, coder="lane"),
        entropy=dataclasses.replace(cfg.entropy, adaptive_tables=False),
    )
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0), (64, 96))
    return codec, params


@pytest.mark.parametrize("context", ["none", "checkerboard"])
def test_batch_matches_per_image_bytes(context, rng):
    codec, params = _codec(context)
    imgs = rng.integers(0, 256, (3, 64, 96, 3), dtype=np.uint8)
    tables = build_tables(codec, params)
    blobs = compress_batch(codec, params, imgs, tables=tables)
    assert len(blobs) == 3
    for i in range(3):
        solo = compress_image(codec, params, imgs[i], tables=tables)
        assert blobs[i] == solo, f"image {i}: fused bytes != per-image bytes"


@pytest.mark.parametrize("context", ["none", "checkerboard"])
def test_batch_round_trip(context, rng):
    codec, params = _codec(context)
    imgs = rng.integers(0, 256, (4, 64, 96, 3), dtype=np.uint8)
    tables = build_tables(codec, params)
    blobs = compress_batch(codec, params, imgs, tables=tables)
    hdr, _ = unpack_container(blobs[0])
    assert hdr.coder == "lane"
    # batch decode == per-image decode, exactly
    batch_out = decompress_batch(codec, params, blobs, tables=tables)
    for i in range(4):
        solo = decompress_image(codec, params, blobs[i], tables=tables)
        np.testing.assert_array_equal(batch_out[i], solo)


def test_unsupported_context_falls_back(rng):
    """Channel-context codecs take the per-image path but still round-trip
    through the batch API surface."""
    from neural_network_image_compression_tpu.config import EntropyConfig

    cfg = tpu_native()
    cfg = cfg.replace(
        entropy=dataclasses.replace(
            cfg.entropy, context="channel", adaptive_tables=False
        ),
    )
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(1), (32, 48))
    imgs = rng.integers(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    blobs = compress_batch(codec, params, imgs)
    out = decompress_batch(codec, params, blobs)
    for i in range(2):
        np.testing.assert_array_equal(
            out[i], decompress_image(codec, params, blobs[i])
        )


def test_mixed_engine_decode(rng):
    """A 'lane' container decodes with the same codec params regardless of
    which API wrote it, and rans64 containers decode through
    decompress_batch too (engine is per-container, self-describing)."""
    codec, params = _codec("checkerboard")
    cfg64 = codec.cfg.replace(
        codec=dataclasses.replace(codec.cfg.codec, coder="rans64")
    )
    codec64 = NeuralCodec(cfg64)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    tables = build_tables(codec, params)
    blob_lane = compress_batch(codec, params, img[None], tables=tables)[0]
    blob_64 = compress_image(codec64, params, img, tables=tables)
    out = decompress_batch(codec, params, [blob_lane, blob_64], tables=tables)
    np.testing.assert_array_equal(out[0], out[1])


def test_batch_odd_latent_grid_matches_per_image(rng):
    """Odd latent grids give unequal anchor/non-anchor stream lengths, so
    the merged-scan envelope actually pads (m_a != m_c) — bytes must still
    equal the per-image path exactly."""
    codec, params = _codec("checkerboard")
    imgs = rng.integers(0, 256, (2, 72, 104, 3), dtype=np.uint8)  # lat 9x13
    tables = build_tables(codec, params)
    blobs = compress_batch(codec, params, imgs, tables=tables)
    for i in range(2):
        solo = compress_image(codec, params, imgs[i], tables=tables)
        assert blobs[i] == solo
    outs = decompress_batch(codec, params, blobs, tables=tables)
    for i in range(2):
        np.testing.assert_array_equal(
            outs[i], decompress_image(codec, params, blobs[i], tables=tables)
        )

"""Lane-parallel (on-chip) rANS: the TPU-native entropy-coding loop.

Gates, mirroring how the conv kernels are gated (VERDICT r4 item 2):
- the XLA scan encoder is BYTE-IDENTICAL to the pure-numpy twin,
- the C++ decoder and the numpy twin both invert it exactly,
- edge cases: n < K, n not divisible by K, empty streams, a degenerate row
  whose single symbol carries the full probability mass (freq == 1<<p, the
  u32-overflow corner the shift-compare renorm test exists for),
- end-to-end: containers written with coder='lane' (v3 coder byte)
  round-trip bit-exactly through the standard compress/decompress paths.
"""
import dataclasses

import jax
import numpy as np
import pytest

from neural_network_image_compression_tpu.coding import lane, rans


def _cdf(rows: int, levels: int = 256, seed: int = 0, precision: int = 16):
    rng = np.random.default_rng(seed)
    pmf = rng.random((rows, levels)) + 0.01
    q = np.floor(pmf / pmf.sum(1, keepdims=True) * (1 << precision)).astype(
        np.int64
    )
    q = np.maximum(q, 1)
    q[:, 0] += (1 << precision) - q.sum(1)
    assert (q > 0).all()
    cdf = np.zeros((rows, levels + 1), np.uint32)
    cdf[:, 1:] = np.cumsum(q, axis=1)
    return cdf


@pytest.mark.parametrize("n", [0, 1, 7, 128, 1000, 12345])
def test_np_round_trip_modular(n):
    cdf = _cdf(8)
    rng = np.random.default_rng(n)
    sym = rng.integers(0, 256, n, dtype=np.uint8)
    rows = (np.arange(n) % 8).astype(np.int32)
    blob = lane.encode_lanes_np(sym, rows, cdf)
    out = lane.decode_lanes_np(blob, rows, cdf)
    np.testing.assert_array_equal(out, sym)


def test_jnp_encoder_byte_identical_to_twin():
    cdf = _cdf(32, seed=1)
    rng = np.random.default_rng(2)
    for n in (5, 129, 4096, 50000):
        sym = rng.integers(0, 256, n, dtype=np.uint8)
        rows = (np.arange(n) % 32).astype(np.int32)
        a = lane.encode_lanes(sym, rows, cdf)
        b = lane.encode_lanes_np(sym, rows, cdf)
        assert a == b, f"n={n}: XLA scan diverges from numpy twin"


def test_cpp_decoder_inverts_jnp_encoder():
    if not rans.native_available():
        pytest.skip("no native coder")
    cdf = _cdf(16, seed=3)
    rng = np.random.default_rng(4)
    sym = rng.integers(0, 256, 30000, dtype=np.uint8)
    rows = rng.integers(0, 16, 30000).astype(np.int32)  # indexed-style rows
    blob = lane.encode_lanes(sym, rows, cdf)
    out = lane.decode_lanes(blob, rows, cdf)
    np.testing.assert_array_equal(out, sym)
    # and the twin agrees with the C++ decoder
    np.testing.assert_array_equal(lane.decode_lanes_np(blob, rows, cdf), sym)


def test_full_mass_row():
    """One row concentrates the entire 1<<16 mass on one symbol: freq<<16
    overflows u32 — the shift-compare renorm test must stay exact."""
    precision = 16
    cdf = _cdf(2, levels=4, precision=precision)
    # row 1: all mass on symbol 2
    cdf[1] = [0, 0, 0, 1 << precision, 1 << precision]
    n = 4000
    rng = np.random.default_rng(5)
    sym = np.where(
        np.arange(n) % 2 == 0, rng.integers(0, 4, n), 2
    ).astype(np.uint8)
    rows = (np.arange(n) % 2).astype(np.int32)
    blob = lane.encode_lanes(sym, rows, cdf, precision)
    assert blob == lane.encode_lanes_np(sym, rows, cdf, precision)
    np.testing.assert_array_equal(
        lane.decode_lanes(blob, rows, cdf, precision), sym
    )


def test_n_smaller_than_lanes():
    cdf = _cdf(4, seed=6)
    sym = np.asarray([1, 200, 3], np.uint8)
    rows = np.asarray([0, 1, 2], np.int32)
    blob = lane.encode_lanes(sym, rows, cdf, lanes=16)
    out = lane.decode_lanes(blob, rows, cdf)
    np.testing.assert_array_equal(out, sym)


def test_stream_dispatchers():
    """rans.stream_* must route engine='lane' correctly for both the modular
    and the indexed call shapes used by codec_stream."""
    cdf = _cdf(32, seed=7)
    rng = np.random.default_rng(8)
    plane = rng.integers(0, 256, (12, 10, 32), dtype=np.uint8)
    blob = rans.stream_encode(plane, cdf, 16, "lane")
    out = rans.stream_decode(blob, plane.size, cdf, 16, "lane")
    np.testing.assert_array_equal(out.reshape(plane.shape), plane)
    idx = rng.integers(0, 32, plane.size).astype(np.int32)
    blob = rans.stream_encode_indexed(plane, idx, cdf, 16, "lane")
    out = rans.stream_decode_indexed(blob, idx, cdf, 16, "lane")
    np.testing.assert_array_equal(out, plane.reshape(-1))


def test_rate_overhead_is_bounded():
    """The K-state flush must stay a rounding error vs rans64 on real-sized
    streams (pick_lanes keeps K <= n/1024)."""
    cdf = _cdf(32, seed=9)
    rng = np.random.default_rng(10)
    sym = rng.integers(0, 256, 96 * 64 * 32, dtype=np.uint8)
    rows = (np.arange(sym.size) % 32).astype(np.int32)
    a = len(lane.encode_lanes(sym, rows, cdf))
    b = len(rans.stream_encode(sym, cdf, 16, "rans64"))
    assert a <= b * 1.01 + 64, (a, b)


@pytest.mark.parametrize("context", ["none", "checkerboard"])
def test_container_round_trip_lane(context, rng, jit_forward):
    from neural_network_image_compression_tpu.coding import (
        compress_image,
        decompress_image,
    )
    from neural_network_image_compression_tpu.coding.container import (
        unpack_container,
    )
    from neural_network_image_compression_tpu.config import Config, tpu_native
    from neural_network_image_compression_tpu.models import NeuralCodec

    cfg = tpu_native() if context == "checkerboard" else Config()
    cfg = cfg.replace(
        codec=dataclasses.replace(cfg.codec, coder="lane")
    )
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0), (64, 96))
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    blob = compress_image(codec, params, rgb)
    header, _ = unpack_container(blob)
    assert header.coder == "lane"
    recon = decompress_image(codec, params, blob)
    np.testing.assert_array_equal(recon, jit_forward(codec, params, rgb))

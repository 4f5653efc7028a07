"""Python interface to the rANS coder.

Primary path: the C++ implementation (_native/rans.cpp) compiled lazily to a
shared library and called through ctypes — zero-copy on numpy buffers.
Fallback / cross-check: a pure-numpy rANS with identical byte output, used by
tests to pin the C++ implementation and by environments without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_NATIVE_DIR, "rans.cpp")
_LIB = os.path.join(_NATIVE_DIR, "librans.so")

_STATE_LOWER_BOUND = 1 << 23
_STATE64_LOWER_BOUND = 1 << 31
_WAYS = 4  # rans64 interleave factor (fixed by the byte format)
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None

#: Engines: 'rans32' is the original byte-wise single-state coder (container
#: flag bit4 clear); 'rans64' is the 64-bit-state, u32-renorm, 4-way
#: interleaved coder (flag bit4 set) — same CDF tables, ~3x decode throughput
#: because the CPU pipelines four independent state chains. 'lane' (container
#: v3, coder byte 2) is the TPU-native coder: K interleaved 32-bit states
#: encoded ON the chip as a lax.scan (coding/lane.py); decode is host C++.
ENGINES = ("rans32", "rans64", "lane")
DEFAULT_ENGINE = "rans64"


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.rans_encode.restype = ctypes.c_int64
        lib.rans_encode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u32p, ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        lib.rans_decode.restype = ctypes.c_int64
        lib.rans_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u32p, ctypes.c_int32, u8p,
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rans_encode_indexed.restype = ctypes.c_int64
        lib.rans_encode_indexed.argtypes = [
            u8p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u32p, ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        lib.rans_decode_indexed.restype = ctypes.c_int64
        lib.rans_decode_indexed.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int32, u32p, ctypes.c_int32, u8p,
        ]
        lib.rans_build_lut.restype = ctypes.c_int64
        lib.rans_build_lut.argtypes = [
            u32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
        ]
        lib.rans64_encode.restype = ctypes.c_int64
        lib.rans64_encode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u32p, ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        lib.rans64_decode.restype = ctypes.c_int64
        lib.rans64_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, u32p, ctypes.c_int32, u8p, u8p,
        ]
        lib.rans64_encode_indexed.restype = ctypes.c_int64
        lib.rans64_encode_indexed.argtypes = [
            u8p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u32p, ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        lib.rans64_decode_indexed.restype = ctypes.c_int64
        lib.rans64_decode_indexed.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int32, u32p, ctypes.c_int32, u8p, u8p,
        ]
        lib.rans_lane_decode.restype = ctypes.c_int64
        lib.rans_lane_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_int32, u32p, ctypes.c_int32, u8p, u8p,
        ]
        _lib = lib
        return _lib


# Decoder slot->symbol tables are pure functions of the CDF array; building
# one walks rows << precision bytes, which at serving rates rivals the decode
# itself. Cache a few, keyed by table content (tables change only when the
# checkpoint does).
_LUT_CACHE: "dict[tuple, np.ndarray]" = {}
_LUT_CACHE_MAX = 8


def _decoder_lut(cdf: np.ndarray, precision: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    import hashlib

    key = (hashlib.sha1(cdf.tobytes()).digest(), cdf.shape, precision)
    lut = _LUT_CACHE.get(key)
    if lut is None:
        rows = cdf.shape[0]
        lut = np.empty(rows << precision, np.uint8)
        r = lib.rans_build_lut(
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rows, cdf.shape[1] - 1, precision,
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if r < 0:
            raise ValueError("invalid CDF table (rows must sum to 1<<precision)")
        with _lock:
            if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
                _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
            _LUT_CACHE[key] = lut
    return lut


def native_available() -> bool:
    return _load() is not None


def _check(symbols: np.ndarray, cdf: np.ndarray, precision: int) -> tuple[np.ndarray, np.ndarray, int]:
    flat = np.ascontiguousarray(symbols, np.uint8).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    if cdf.ndim != 2:
        raise ValueError("cdf must be [C, L+1]")
    if (cdf[:, -1] != (1 << precision)).any():
        raise ValueError("cdf[:, -1] must equal 1 << precision")
    return flat, cdf, cdf.shape[1] - 1


def encode(symbols: np.ndarray, cdf: np.ndarray, precision: int = 16) -> bytes:
    """Encode uint8 symbols (channel of flat index i = i % C) -> bytes."""
    flat, cdf, levels = _check(symbols, cdf, precision)
    lib = _load()
    if lib is None:
        return encode_py(flat, cdf, precision)
    cap = flat.size + (flat.size >> 1) + 64
    out = np.empty(cap, np.uint8)
    n = lib.rans_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flat.size,
        cdf.shape[0],
        levels,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        precision,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if n < 0:
        # Pathological inputs can exceed the capacity guess; retry roomier.
        cap = flat.size * 3 + 64
        out = np.empty(cap, np.uint8)
        n = lib.rans_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            flat.size,
            cdf.shape[0],
            levels,
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            precision,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n < 0:
            raise RuntimeError("rans_encode failed")
    return out[:n].tobytes()


def decode(data: bytes, n: int, cdf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Decode n uint8 symbols from bytes."""
    cdf = np.ascontiguousarray(cdf, np.uint32)
    levels = cdf.shape[1] - 1
    lib = _load()
    if lib is None:
        return decode_py(data, n, cdf, precision)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.uint8)
    r = lib.rans_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        n,
        cdf.shape[0],
        levels,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        precision,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if r != n:
        raise RuntimeError("rans_decode failed (malformed stream?)")
    return out


# ------------------------------------------------------------ indexed variant


def _check_indexed(symbols, index, cdf, precision):
    flat = np.ascontiguousarray(symbols, np.uint8).reshape(-1)
    idx = np.ascontiguousarray(index, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    if idx.size != flat.size:
        raise ValueError("index must have one entry per symbol")
    if cdf.ndim != 2:
        raise ValueError("cdf must be [rows, L+1]")
    if (cdf[:, -1] != (1 << precision)).any():
        raise ValueError("cdf[:, -1] must equal 1 << precision")
    if idx.size and (idx.min() < 0 or idx.max() >= cdf.shape[0]):
        raise ValueError("index out of range")
    return flat, idx, cdf


def encode_indexed(symbols: np.ndarray, index: np.ndarray, cdf: np.ndarray,
                   precision: int = 16) -> bytes:
    """Encode uint8 symbols where symbol i uses CDF row ``index[i]`` —
    the conditional-coding path (context model scale bins)."""
    flat, idx, cdf = _check_indexed(symbols, index, cdf, precision)
    lib = _load()
    if lib is None:
        return encode_indexed_py(flat, idx, cdf, precision)
    levels = cdf.shape[1] - 1
    for cap in (flat.size + (flat.size >> 1) + 64, flat.size * 3 + 64):
        out = np.empty(cap, np.uint8)
        n = lib.rans_encode_indexed(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flat.size, cdf.shape[0], levels,
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            precision,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n >= 0:
            return out[:n].tobytes()
    raise RuntimeError("rans_encode_indexed failed")


def decode_indexed(data: bytes, index: np.ndarray, cdf: np.ndarray,
                   precision: int = 16) -> np.ndarray:
    """Decode len(index) symbols, symbol i from CDF row ``index[i]``."""
    idx = np.ascontiguousarray(index, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    lib = _load()
    if lib is None:
        return decode_indexed_py(data, idx, cdf, precision)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(idx.size, np.uint8)
    r = lib.rans_decode_indexed(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, idx.size,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cdf.shape[0], cdf.shape[1] - 1,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        precision,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if r != idx.size:
        raise RuntimeError("rans_decode_indexed failed (malformed stream?)")
    return out


def encode_indexed_py(symbols, index, cdf, precision: int = 16) -> bytes:
    """Pure-python twin; byte-identical to the C++ indexed encoder."""
    flat, idx, cdf = _check_indexed(symbols, index, cdf, precision)
    out = bytearray()
    state = _STATE_LOWER_BOUND
    for i in range(flat.size - 1, -1, -1):
        row = int(idx[i])
        s = int(flat[i])
        start = int(cdf[row, s])
        freq = int(cdf[row, s + 1]) - start
        x_max = ((_STATE_LOWER_BOUND >> precision) << 8) * freq
        while state >= x_max:
            out.append(state & 0xFF)
            state >>= 8
        state = ((state // freq) << precision) + (state % freq) + start
    head = bytes(
        [state & 0xFF, (state >> 8) & 0xFF, (state >> 16) & 0xFF, (state >> 24) & 0xFF]
    )
    return head + bytes(reversed(out))


def decode_indexed_py(data: bytes, index, cdf, precision: int = 16) -> np.ndarray:
    idx = np.asarray(index, np.int32).reshape(-1)
    cdf = np.asarray(cdf, np.uint32)
    mask = (1 << precision) - 1
    state = int.from_bytes(data[:4], "little")
    pos = 4
    out = np.empty(idx.size, np.uint8)
    luts = {}
    for row in np.unique(idx):
        lut = np.zeros(1 << precision, np.uint8)
        bounds = cdf[row]
        for s in range(cdf.shape[1] - 1):
            lut[bounds[s] : bounds[s + 1]] = s
        luts[int(row)] = lut
    for i in range(idx.size):
        row = int(idx[i])
        slot = state & mask
        s = int(luts[row][slot])
        out[i] = s
        start = int(cdf[row, s])
        freq = int(cdf[row, s + 1]) - start
        state = freq * (state >> precision) + slot - start
        while state < _STATE_LOWER_BOUND:
            state = (state << 8) | data[pos]
            pos += 1
    return out


# ----------------------------------------------------------- pure-python twin


def encode_py(symbols: np.ndarray, cdf: np.ndarray, precision: int = 16) -> bytes:
    """Reference implementation; byte-identical to the C++ coder."""
    flat, cdf, _ = _check(symbols, cdf, precision)
    c = cdf.shape[0]
    out = bytearray()
    state = _STATE_LOWER_BOUND
    for i in range(flat.size - 1, -1, -1):
        ch = i % c
        s = int(flat[i])  # int() guards against uint8 overflow in s + 1
        start = int(cdf[ch, s])
        freq = int(cdf[ch, s + 1]) - start
        x_max = ((_STATE_LOWER_BOUND >> precision) << 8) * freq
        while state >= x_max:
            out.append(state & 0xFF)
            state >>= 8
        state = ((state // freq) << precision) + (state % freq) + start
    head = bytes(
        [state & 0xFF, (state >> 8) & 0xFF, (state >> 16) & 0xFF, (state >> 24) & 0xFF]
    )
    return head + bytes(reversed(out))


# --------------------------------------------------- rans64 (interleaved) API


def encode64(symbols: np.ndarray, cdf: np.ndarray, precision: int = 16) -> bytes:
    """4-way-interleaved 64-bit rANS encode (channel of flat i = i % C)."""
    flat, cdf, levels = _check(symbols, cdf, precision)
    lib = _load()
    if lib is None:
        return encode64_py(flat, cdf, precision)
    for cap in (flat.size + (flat.size >> 1) + 64, flat.size * 3 + 64):
        out = np.empty(cap, np.uint8)
        n = lib.rans64_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            flat.size, cdf.shape[0], levels,
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            precision,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n >= 0:
            return out[:n].tobytes()
    raise RuntimeError("rans64_encode failed")


def decode64(data: bytes, n: int, cdf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Decode n symbols from a :func:`encode64` stream."""
    cdf = np.ascontiguousarray(cdf, np.uint32)
    lib = _load()
    if lib is None:
        return decode64_py(data, n, cdf, precision)
    lut = _decoder_lut(cdf, precision)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.uint8)
    r = lib.rans64_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, n, cdf.shape[0], cdf.shape[1] - 1,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        precision,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if r != n:
        raise RuntimeError("rans64_decode failed (malformed stream?)")
    return out


def encode64_indexed(symbols: np.ndarray, index: np.ndarray, cdf: np.ndarray,
                     precision: int = 16) -> bytes:
    """Interleaved indexed encode: symbol i coded with CDF row ``index[i]``."""
    flat, idx, cdf = _check_indexed(symbols, index, cdf, precision)
    lib = _load()
    if lib is None:
        return encode64_indexed_py(flat, idx, cdf, precision)
    levels = cdf.shape[1] - 1
    for cap in (flat.size + (flat.size >> 1) + 64, flat.size * 3 + 64):
        out = np.empty(cap, np.uint8)
        n = lib.rans64_encode_indexed(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flat.size, cdf.shape[0], levels,
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            precision,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n >= 0:
            return out[:n].tobytes()
    raise RuntimeError("rans64_encode_indexed failed")


def decode64_indexed(data: bytes, index: np.ndarray, cdf: np.ndarray,
                     precision: int = 16) -> np.ndarray:
    """Decode len(index) symbols from a :func:`encode64_indexed` stream."""
    idx = np.ascontiguousarray(index, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    lib = _load()
    if lib is None:
        return decode64_indexed_py(data, idx, cdf, precision)
    lut = _decoder_lut(cdf, precision)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(idx.size, np.uint8)
    r = lib.rans64_decode_indexed(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, idx.size,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cdf.shape[0], cdf.shape[1] - 1,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        precision,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if r != idx.size:
        raise RuntimeError("rans64_decode_indexed failed (malformed stream?)")
    return out


# Engine dispatchers: the coding layer picks bytes-format by name so the
# container can record (flag bit4) which coder wrote a stream and decode
# remains self-describing across releases.


def _mod_rows(n: int, c: int) -> np.ndarray:
    return (np.arange(n, dtype=np.int64) % c).astype(np.int32)


def stream_encode(symbols, cdf, precision: int = 16,
                  engine: str = DEFAULT_ENGINE) -> bytes:
    if engine == "lane":
        from neural_network_image_compression_tpu.coding import lane

        flat = np.ascontiguousarray(symbols, np.uint8).reshape(-1)
        return lane.encode_lanes(
            flat, _mod_rows(flat.size, np.asarray(cdf).shape[0]), cdf, precision
        )
    return (encode if engine == "rans32" else encode64)(symbols, cdf, precision)


def stream_decode(data, n, cdf, precision: int = 16,
                  engine: str = DEFAULT_ENGINE) -> np.ndarray:
    if engine == "lane":
        from neural_network_image_compression_tpu.coding import lane

        return lane.decode_lanes(
            data, _mod_rows(n, np.asarray(cdf).shape[0]), cdf, precision
        )
    return (decode if engine == "rans32" else decode64)(data, n, cdf, precision)


def stream_encode_indexed(symbols, index, cdf, precision: int = 16,
                          engine: str = DEFAULT_ENGINE) -> bytes:
    if engine == "lane":
        from neural_network_image_compression_tpu.coding import lane

        return lane.encode_lanes(symbols, index, cdf, precision)
    fn = encode_indexed if engine == "rans32" else encode64_indexed
    return fn(symbols, index, cdf, precision)


def stream_decode_indexed(data, index, cdf, precision: int = 16,
                          engine: str = DEFAULT_ENGINE) -> np.ndarray:
    if engine == "lane":
        from neural_network_image_compression_tpu.coding import lane

        return lane.decode_lanes(data, index, cdf, precision)
    fn = decode_indexed if engine == "rans32" else decode64_indexed
    return fn(data, index, cdf, precision)


# ------------------------------------------------------- rans64 python twins


def _encode64_core(flat, rows_of, cdf, precision: int) -> bytes:
    """Shared twin body; ``rows_of(i)`` maps flat index -> CDF row."""
    lower = _STATE64_LOWER_BOUND
    states = [lower] * _WAYS
    words: list[int] = []
    for i in range(flat.size - 1, -1, -1):
        row = rows_of(i)
        s = int(flat[i])
        start = int(cdf[row, s])
        freq = int(cdf[row, s + 1]) - start
        w = i % _WAYS
        x = states[w]
        x_max = ((lower >> precision) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        states[w] = ((x // freq) << precision) + (x % freq) + start
    for w in range(_WAYS):
        words.append(states[w] & 0xFFFFFFFF)
        words.append((states[w] >> 32) & 0xFFFFFFFF)
    return np.asarray(words[::-1], dtype="<u4").tobytes()


def _decode64_core(data: bytes, n: int, rows_of, cdf, precision: int) -> np.ndarray:
    words = np.frombuffer(data, dtype="<u4")
    states = []
    pos = 0
    for _ in range(_WAYS):
        hi, lo = int(words[pos]), int(words[pos + 1])
        states.append((hi << 32) | lo)
        pos += 2
    states = states[::-1]  # read order is state 3 first
    mask = (1 << precision) - 1
    out = np.empty(n, np.uint8)
    luts = {}
    for i in range(n):
        row = rows_of(i)
        lut = luts.get(row)
        if lut is None:
            lut = np.zeros(1 << precision, np.uint8)
            bounds = cdf[row]
            for s in range(cdf.shape[1] - 1):
                lut[bounds[s] : bounds[s + 1]] = s
            luts[row] = lut
        w = i % _WAYS
        x = states[w]
        slot = x & mask
        s = int(lut[slot])
        out[i] = s
        start = int(cdf[row, s])
        freq = int(cdf[row, s + 1]) - start
        x = freq * (x >> precision) + slot - start
        if x < _STATE64_LOWER_BOUND:
            x = (x << 32) | int(words[pos])
            pos += 1
        states[w] = x
    return out


def encode64_py(symbols, cdf, precision: int = 16) -> bytes:
    """Pure-python twin; byte-identical to the C++ rans64 encoder."""
    flat, cdf, _ = _check(symbols, cdf, precision)
    c = cdf.shape[0]
    return _encode64_core(flat, lambda i: i % c, cdf, precision)


def decode64_py(data: bytes, n: int, cdf, precision: int = 16) -> np.ndarray:
    cdf = np.asarray(cdf, np.uint32)
    c = cdf.shape[0]
    return _decode64_core(data, n, lambda i: i % c, cdf, precision)


def encode64_indexed_py(symbols, index, cdf, precision: int = 16) -> bytes:
    flat, idx, cdf = _check_indexed(symbols, index, cdf, precision)
    return _encode64_core(flat, lambda i: int(idx[i]), cdf, precision)


def decode64_indexed_py(data: bytes, index, cdf, precision: int = 16) -> np.ndarray:
    idx = np.asarray(index, np.int32).reshape(-1)
    cdf = np.asarray(cdf, np.uint32)
    return _decode64_core(data, idx.size, lambda i: int(idx[i]), cdf, precision)


def decode_py(data: bytes, n: int, cdf: np.ndarray, precision: int = 16) -> np.ndarray:
    cdf = np.asarray(cdf, np.uint32)
    c = cdf.shape[0]
    mask = (1 << precision) - 1
    state = int.from_bytes(data[:4], "little")
    pos = 4
    out = np.empty(n, np.uint8)
    # slot -> symbol lookup per channel
    luts = []
    for ch in range(c):
        lut = np.zeros(1 << precision, np.uint8)
        bounds = cdf[ch]
        for s in range(cdf.shape[1] - 1):
            lut[bounds[s] : bounds[s + 1]] = s
        luts.append(lut)
    for i in range(n):
        ch = i % c
        slot = state & mask
        s = int(luts[ch][slot])
        out[i] = s
        start = int(cdf[ch, s])
        freq = int(cdf[ch, s + 1]) - start
        state = freq * (state >> precision) + slot - start
        while state < _STATE_LOWER_BOUND:
            state = (state << 8) | data[pos]
            pos += 1
    return out

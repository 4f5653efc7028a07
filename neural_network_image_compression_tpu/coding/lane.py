"""Lane-parallel rANS — the entropy-coding loop ON the chip.

The rans32/rans64 engines (coding/rans.py + _native/rans.cpp) run the
per-symbol coding loop on the HOST; the chip only produces symbols. That
made single-image serving host-bound (round-4 profile). This module is the
TPU-native engine: K independent 32-bit rANS states advance in lockstep
over a ``lax.scan``, every per-symbol table lookup is a vectorized gather,
and each scan step is pure u32 vector arithmetic on K lanes — exactly the
shape the VPU wants. The host's only job is byte assembly: reverse the
emission mask, compact the emitted u16 words, and prepend the final states
(numpy boolean indexing, microseconds).

Replaces (TPU-natively) the reference's host-side PNG/DEFLATE entropy coding
at tf2_0/src/utils.py:85-87.

Format ("lane" engine, container v3 coder=2):
    u16 K                      number of interleaved lanes
    u32 x K                    final encoder states, little-endian
    u16 x n_words              renorm words, in DECODE consumption order
Symbols are assigned round-robin (symbol i -> lane i % K, step i // K).
Renormalization is 16-bit (state in [2^16, 2^32), at most one word per
symbol), the ryg rans_word construction, so encoder (reverse order) and
decoder (forward order) emission sequences are exact mirrors and a single
shared word stream needs no per-lane offsets.

Decode is host-side C++ (coding/_native/rans.cpp rans_lane_decode) with a
pure-numpy twin — measured faster than a chip round-trip for the decode
direction (the conditional decode passes need host logic between streams
anyway). Encoder parity: the jnp/XLA encoder is bit-exact against
:func:`encode_lanes_np` (tests/test_lane.py), and both against the C++
decoder's inverse.
"""
from __future__ import annotations

import functools

import numpy as np

_LOWER = 1 << 16  # state lower bound; 16-bit renorm => <=1 word per symbol


def pick_lanes(n: int) -> int:
    """Lane count for an n-symbol stream: enough lanes to keep the VPU wide
    (scan length n/K), few enough that the 4K-byte state flush stays a
    rounding error on the stream size. Powers of two, capped at 256."""
    if n <= 0:
        return 1
    k = 1
    while k < 256 and k * 1024 < n:
        k *= 2
    return k


# --------------------------------------------------------------- jnp encoder


def lane_scan_sf(start2, freq2, active, precision: int):
    """The traceable on-chip encode core over PRE-GATHERED coding params:
    (start2 [m,K] u32, freq2 [m,K] u32, active [m,K] bool) ->
    (states [K] u32, words [m,K] u16, emit [m,K] bool).

    The scan body is pure u32 vector arithmetic — the per-symbol CDF
    lookups happen OUTSIDE the scan: XLA:TPU lowers an in-loop gather from
    a multi-row table catastrophically (measured 1.06 s vs 55 ms for 18.8M
    lookups done as a one-hot contraction — see onchip._start_freq)."""
    import jax
    import jax.numpy as jnp

    shift = 32 - precision
    k = start2.shape[1]

    def step(states, xs):
        start, freq, act = xs
        freq = jnp.where(act, freq, jnp.uint32(1))
        # renorm test (x >= freq << shift) without u32 overflow:
        # floor(x / 2^shift) >= freq  <=>  x >= freq * 2^shift
        emit = act & ((states >> shift) >= freq)
        word = (states & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x = jnp.where(emit, states >> 16, states)
        q = x // freq
        r = x - q * freq
        x2 = (q << precision) + r + start
        states = jnp.where(act, x2, states)
        return states, (word, emit)

    init = jnp.full((k,), jnp.uint32(_LOWER))
    states, (words, emits) = jax.lax.scan(
        step, init, (start2, freq2, active), reverse=True
    )
    return states, words, emits


def lane_scan(sym2, rows2, active, cdf_flat, lp1: int, precision: int):
    """Symbol-level wrapper of :func:`lane_scan_sf`: one hoisted
    jnp.take per grid (fine on CPU and for standalone streams; the fused
    TPU path uses the one-hot contraction in coding/onchip.py instead)."""
    import jax.numpy as jnp

    base = rows2 * lp1 + sym2
    start2 = jnp.take(cdf_flat, base)
    freq2 = jnp.take(cdf_flat, base + 1) - start2
    return lane_scan_sf(start2, freq2, active, precision)


def checksum_u32(sym) -> "int | jnp-scalar":
    """Order-independent Fletcher-style integrity checksum of a symbol
    array, identical under numpy (host) and jnp (device) evaluation:
    s1 = sum(v) mod 2^32, s2 = sum((n-i)*v_i) mod 2^32 (both pure wrapping
    u32 reductions — no accumulation-order sensitivity, unlike a float or a
    serial CRC), combined as s1 + 0x9E3779B1*s2, forced nonzero.

    'lane' containers carry THIS in the sym_crc header field instead of
    zlib CRC-32: CRC's byte-serial state chain cannot be evaluated on-chip,
    and fetching the full symbol batch to the host just to hash it was
    ~30% of fused-batch compress wall time (runs_r5/serving_breakdown)."""
    import numpy as _np

    flat = sym.reshape(-1)
    if isinstance(flat, _np.ndarray):
        v = flat.astype(_np.uint32)
        n = v.size
        s1 = int(_np.sum(v, dtype=_np.uint32))
        w = _np.arange(n, 0, -1, dtype=_np.uint32)
        s2 = int(_np.sum(w * v, dtype=_np.uint32))
        chk = (s1 + 0x9E3779B1 * s2) & 0xFFFFFFFF  # exact ints, then wrap
        return chk or 1
    import jax.numpy as jnp

    v = flat.astype(jnp.uint32)
    n = v.shape[0]
    s1 = jnp.sum(v, dtype=jnp.uint32)
    w = jnp.arange(n, 0, -1, dtype=jnp.uint32)
    s2 = jnp.sum(w * v, dtype=jnp.uint32)
    chk = s1 + jnp.uint32(0x9E3779B1) * s2
    return jnp.where(chk == 0, jnp.uint32(1), chk)


def pack_words(words, emit):
    """Traced on-chip compaction: ([m,K] u16 words, [m,K] bool emit) ->
    ([m*K] u16 packed, count i32). The packed prefix [:count] is exactly
    ``words.reshape(-1)[emit.reshape(-1)]`` (the decoder's consumption
    order); slots >= count hold junk from the masked scatter and are never
    read. Keeps the host fetch at real-stream size instead of the full
    words+mask grids (~25x on typical rates)."""
    import jax.numpy as jnp

    flat_w = words.reshape(-1)
    flat_e = emit.reshape(-1)
    cap = flat_w.shape[0]
    pos = jnp.cumsum(flat_e) - 1
    dest = jnp.where(flat_e, pos, cap - 1)
    packed = jnp.zeros(cap, words.dtype).at[dest].set(flat_w, mode="drop")
    count = jnp.sum(flat_e).astype(jnp.int32)
    return packed, count


@functools.lru_cache(maxsize=32)
def _jit_core(m: int, k: int, rows: int, lp1: int, precision: int):
    """Compiled standalone wrapper of :func:`lane_scan` for a (m, K) grid."""
    import jax

    return jax.jit(
        lambda sym2, rows2, active, cdf_flat: lane_scan(
            sym2, rows2, active, cdf_flat, lp1, precision
        )
    )


def _grid(sym: np.ndarray, rows: np.ndarray, k: int):
    """Round-robin [n] -> [m, K] grids + active mask (numpy, encode side).
    Symbols come back int32 — they are gather indices into the CDF table."""
    n = sym.size
    m = -(-n // k) if n else 1
    pad = m * k - n
    sym2 = np.concatenate([sym.astype(np.int32), np.zeros(pad, np.int32)])
    rows2 = np.concatenate([rows.astype(np.int32), np.zeros(pad, np.int32)])
    active = np.arange(m * k) < n
    return (
        sym2.reshape(m, k),
        rows2.reshape(m, k),
        active.reshape(m, k),
        m,
    )


def _assemble(k: int, states: np.ndarray, words: np.ndarray,
              emit: np.ndarray) -> bytes:
    """(final states, [m,K] words + emission mask) -> stream bytes.
    Row-major flatten of the step-ascending grids IS the decoder's
    consumption order (see module docstring)."""
    out_words = np.ascontiguousarray(words.reshape(-1)[emit.reshape(-1)])
    return (
        int(k).to_bytes(2, "little")
        + np.asarray(states, "<u4").tobytes()
        + out_words.astype("<u2").tobytes()
    )


def encode_lanes(sym: np.ndarray, rows: np.ndarray, cdf: np.ndarray,
                 precision: int = 16, lanes: int | None = None) -> bytes:
    """Encode flat uint8 symbols (CDF row of symbol i = ``rows[i]``) with the
    on-chip lane coder; returns the 'lane' stream bytes. Runs the scan as a
    standalone jit on the default device — the fused serving path calls
    :func:`_jit_core` inside its own jit instead."""
    sym = np.ascontiguousarray(sym, np.uint8).reshape(-1)
    rows = np.ascontiguousarray(rows, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    if (cdf[:, -1] != (1 << precision)).any():
        raise ValueError("cdf[:, -1] must equal 1 << precision")
    k = lanes or pick_lanes(sym.size)
    if sym.size == 0:
        return _assemble(k, np.full(k, _LOWER, np.uint32),
                         np.zeros((0, k), np.uint16),
                         np.zeros((0, k), bool))
    sym2, rows2, active, m = _grid(sym, rows, k)
    fn = _jit_core(m, k, cdf.shape[0], cdf.shape[1], precision)
    states, words, emits = fn(sym2, rows2, active, cdf.reshape(-1))
    return _assemble(k, np.asarray(states), np.asarray(words),
                     np.asarray(emits))


def encode_lanes_np(sym: np.ndarray, rows: np.ndarray, cdf: np.ndarray,
                    precision: int = 16, lanes: int | None = None) -> bytes:
    """Pure-numpy twin; byte-identical to :func:`encode_lanes` (the parity
    gate for the XLA scan, and the no-JAX fallback)."""
    sym = np.ascontiguousarray(sym, np.uint8).reshape(-1)
    rows = np.ascontiguousarray(rows, np.int64).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint64)
    k = lanes or pick_lanes(sym.size)
    if sym.size == 0:
        return _assemble(k, np.full(k, _LOWER, np.uint32),
                         np.zeros((0, k), np.uint16),
                         np.zeros((0, k), bool))
    sym2, rows2, active, m = _grid(sym, rows, k)
    sym2 = sym2.astype(np.int64)
    rows2 = rows2.astype(np.int64)
    states = np.full(k, _LOWER, np.uint64)
    words = np.zeros((m, k), np.uint16)
    emits = np.zeros((m, k), bool)
    shift = 32 - precision
    for t in range(m - 1, -1, -1):
        s = sym2[t]
        row = rows2[t]
        act = active[t]
        start = cdf[row, s]
        freq = np.where(act, cdf[row, s + 1] - start, 1)
        emit = act & ((states >> np.uint64(shift)) >= freq)
        emits[t] = emit
        words[t] = (states & np.uint64(0xFFFF)).astype(np.uint16)
        x = np.where(emit, states >> np.uint64(16), states)
        q = x // freq
        r = x - q * freq
        x2 = (q << np.uint64(precision)) + r + start
        states = np.where(act, x2, states)
    return _assemble(k, states.astype(np.uint32), words, emits)


# ---------------------------------------------------------------- decoders


def decode_lanes(data: bytes, rows: np.ndarray, cdf: np.ndarray,
                 precision: int = 16) -> np.ndarray:
    """Decode len(rows) symbols from a 'lane' stream (C++ fast path with the
    numpy twin as fallback)."""
    from neural_network_image_compression_tpu.coding import rans

    rows = np.ascontiguousarray(rows, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    lib = rans._load()
    if lib is None:
        return decode_lanes_np(data, rows, cdf, precision)
    lut = rans._decoder_lut(cdf, precision)
    import ctypes

    buf = np.frombuffer(data, np.uint8)
    out = np.empty(rows.size, np.uint8)
    r = lib.rans_lane_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, rows.size,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cdf.shape[0], cdf.shape[1] - 1,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        precision,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if r != rows.size:
        raise RuntimeError("rans_lane_decode failed (malformed stream?)")
    return out


def decode_lanes_np(data: bytes, rows: np.ndarray, cdf: np.ndarray,
                    precision: int = 16) -> np.ndarray:
    """Pure-numpy twin decoder. Vectorized across lanes per step; the only
    sequential dependency is the shared word pointer, resolved per step with
    a cumulative sum over the lane-ordered read mask."""
    rows = np.ascontiguousarray(rows, np.int64).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.uint64)
    n = rows.size
    k = int.from_bytes(data[:2], "little")
    states = np.frombuffer(data, "<u4", count=k, offset=2).astype(np.uint64)
    words = np.frombuffer(data, "<u2", offset=2 + 4 * k).astype(np.uint64)
    if words.size == 0:
        words = np.zeros(1, np.uint64)  # gather target when nothing renorms
    m = -(-n // k) if n else 0
    pad = m * k - n
    rows2 = np.concatenate([rows, np.zeros(pad, np.int64)]).reshape(m, k)
    active = (np.arange(m * k) < n).reshape(m, k)
    mask = np.uint64((1 << precision) - 1)
    out = np.empty(m * k, np.uint8)
    # slot -> symbol LUT, flat-indexed by row * 2^precision + slot
    levels = cdf.shape[1] - 1
    lut = np.zeros((cdf.shape[0], 1 << precision), np.uint8)
    for rr in range(cdf.shape[0]):
        bounds = cdf[rr]
        for s in range(levels):
            lut[rr, bounds[s] : bounds[s + 1]] = s
    wp = 0
    states = states.copy()
    for t in range(m):
        row = rows2[t]
        act = active[t]
        slot = states & mask
        s = lut[row, slot.astype(np.int64)]
        out[t * k : (t + 1) * k] = s
        start = cdf[row, s]
        freq = cdf[row, s.astype(np.int64) + 1] - start
        x = freq * (states >> np.uint64(precision)) + slot - start
        need = act & (x < _LOWER)
        idx = wp + np.cumsum(need) - 1
        fed = (x << np.uint64(16)) | words[np.minimum(idx, words.size - 1)]
        x = np.where(need, fed, x)
        states = np.where(act, x, states)
        wp += int(need.sum())
    return out[:n]

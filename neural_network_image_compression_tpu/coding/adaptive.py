"""Per-image adaptive CDF tables — the learned codec's dynamic-Huffman.

The model's factorized CDF tables are static per checkpoint; DEFLATE (the
reference's coder, tf2_0/src/utils.py:85-87) adapts to each image's statistics,
which is why it wins at extreme-low rates where the latent collapses to long
near-constant runs (RESULTS.md §1, λ=0.3). This module closes that gap the
classical way: the encoder histograms the actual symbols per channel, builds
an exact fixed-point CDF restricted to the occurring support, and transmits
the table in the container (~10 bytes/channel; ~0.02 bpp on Kodak-size
images). Symbols outside the transmitted support cannot occur by
construction, so zero-frequency entries are safe.

Wire format per channel (little-endian):
    u8  min_sym
    u8  span_minus_1            # last_sym - min_sym
    if span_minus_1 == 0: nothing — single symbol with the full 2^precision
    else: (span) x u16 freq     # may be 0 inside the support; sums to 2^p

Requires precision <= 16 (u16 freqs; with >=2 present symbols every
frequency fits 65535).
"""
from __future__ import annotations

import struct

import numpy as np


def count_cdf(counts: np.ndarray, precision: int = 16) -> np.ndarray:
    """[C, L] integer counts -> [C, L+1] uint32 CDF summing to 2**precision.

    Unlike cdf.quantize_pmf, zero-count symbols KEEP frequency zero (they
    cannot occur); present symbols get >= 1. Largest-remainder apportionment,
    ties broken by symbol index (deterministic)."""
    counts = np.asarray(counts, np.int64)
    if counts.ndim != 2:
        raise ValueError(f"expected [C, L], got {counts.shape}")
    total = 1 << precision
    c, l = counts.shape
    cdf = np.zeros((c, l + 1), np.uint32)
    for ch in range(c):
        n = counts[ch].sum()
        if n <= 0:
            raise ValueError(f"channel {ch} has no symbols")
        present = counts[ch] > 0
        n_present = int(present.sum())
        if n_present > total:
            raise ValueError("more distinct symbols than table slots")
        scaled = counts[ch] / n * total
        freq = np.floor(scaled).astype(np.int64)
        freq[present] = np.maximum(freq[present], 1)
        diff = total - int(freq.sum())
        if diff > 0:
            loss = np.where(present, scaled - np.floor(scaled), -1.0)
            order = np.argsort(-loss, kind="stable")
            for k in range(diff):
                freq[order[k % n_present]] += 1
        elif diff < 0:
            order = np.argsort(-freq, kind="stable")
            k = 0
            while diff < 0:
                idx = order[k % l]
                if freq[idx] > 1:
                    freq[idx] -= 1
                    diff += 1
                k += 1
        cdf[ch, 1:] = np.cumsum(freq, dtype=np.int64).astype(np.uint32)
        assert cdf[ch, -1] == total
    return cdf


def plane_histogram_cdf(plane: np.ndarray, levels: int = 256,
                        precision: int = 16,
                        mask: np.ndarray | None = None) -> np.ndarray:
    """[h,w,C] uint8 symbols (optionally restricted to ``mask`` positions)
    -> per-channel exact-histogram CDF [C, levels+1]."""
    sel = plane[mask] if mask is not None else plane.reshape(-1, plane.shape[-1])
    c = sel.shape[-1]
    counts = np.zeros((c, levels), np.int64)
    for ch in range(c):
        counts[ch] = np.bincount(sel[:, ch], minlength=levels)
    return count_cdf(counts, precision)


def serialize_cdf(cdf: np.ndarray, precision: int = 16) -> bytes:
    """[C, L+1] CDF -> compact support-restricted table bytes."""
    if precision > 16:
        raise ValueError("adaptive tables require precision <= 16")
    out = bytearray()
    freqs_all = np.diff(cdf.astype(np.int64), axis=1)
    for ch in range(cdf.shape[0]):
        freqs = freqs_all[ch]
        nz = np.nonzero(freqs)[0]
        first, last = int(nz[0]), int(nz[-1])
        out += struct.pack("<BB", first, last - first)
        if last != first:
            span = freqs[first : last + 1]
            out += span.astype("<u2").tobytes()
    return bytes(out)


def deserialize_cdf(data: bytes, channels: int, levels: int = 256,
                    precision: int = 16) -> np.ndarray:
    """Inverse of :func:`serialize_cdf`."""
    total = 1 << precision
    cdf = np.zeros((channels, levels + 1), np.uint32)
    pos = 0
    for ch in range(channels):
        first, span1 = struct.unpack_from("<BB", data, pos)
        pos += 2
        freqs = np.zeros(levels, np.int64)
        if span1 == 0:
            freqs[first] = total
        else:
            n = span1 + 1
            vals = np.frombuffer(data, "<u2", count=n, offset=pos)
            pos += 2 * n
            freqs[first : first + n] = vals
        if freqs.sum() != total:
            raise ValueError(f"adaptive table channel {ch} sums to {freqs.sum()}")
        cdf[ch, 1:] = np.cumsum(freqs, dtype=np.int64).astype(np.uint32)
    if pos != len(data):
        raise ValueError("trailing bytes in adaptive table stream")
    return cdf

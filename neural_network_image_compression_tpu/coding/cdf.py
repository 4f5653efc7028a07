"""Learned PMF -> fixed-point CDF tables for the rANS coder.

The factorized entropy model (models/entropy.py) yields float per-channel
PMFs; the coder needs integer tables that are *bit-identical on every host
and chip* (SURVEY.md section 7 "hard parts" item 1). We therefore:

1. round the float PMF to float32 (one canonical representation),
2. quantize to integer frequencies summing exactly to 2**precision with pure
   deterministic integer arithmetic (no data-dependent float comparisons),
3. guarantee every symbol has frequency >= 1 so any latent is encodable.
"""
from __future__ import annotations

import numpy as np


def quantize_pmf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """[C, L] float pmf -> [C, L+1] uint32 CDF with cdf[:, L] == 2**precision.

    Deterministic: ties broken by symbol index (stable argsort on negated
    frequency), arithmetic on exact integers after the initial float32 round.
    """
    if pmf.ndim != 2:
        raise ValueError(f"expected [C, L], got {pmf.shape}")
    total = 1 << precision
    pmf32 = np.maximum(pmf.astype(np.float32), 0.0)
    c, l = pmf32.shape
    if l > total:
        raise ValueError(f"{l} symbols cannot all get mass >= 1 at precision {precision}")
    cdf = np.zeros((c, l + 1), np.uint32)
    for ch in range(c):
        p = pmf32[ch].astype(np.float64)
        s = p.sum()
        if s <= 0:
            freq = np.full(l, total // l, np.int64)
            freq[: total - int(freq.sum())] += 1
        else:
            scaled = p / s * total
            freq = np.floor(scaled).astype(np.int64)
            freq = np.maximum(freq, 1)
            diff = total - int(freq.sum())
            if diff > 0:
                # Give the remainder to the symbols with the largest rounding
                # loss; ties broken by index via stable sort.
                loss = scaled - np.floor(scaled)
                order = np.argsort(-loss, kind="stable")
                for k in range(diff):
                    freq[order[k % l]] += 1
            elif diff < 0:
                # Take mass from the largest frequencies (never below 1).
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


def make_scale_table(num_bins: int = 64, scale_min: float = 0.11,
                     scale_max: float = 256.0) -> np.ndarray:
    """Log-spaced conditional-Gaussian scale bins (symbol units). Static —
    shared by encoder and decoder without transmission."""
    return np.exp(
        np.linspace(np.log(scale_min), np.log(scale_max), num_bins)
    ).astype(np.float32)


def gaussian_scale_cdfs(scale_table: np.ndarray, levels: int = 256,
                        precision: int = 16) -> np.ndarray:
    """[S, levels+1] uint32 CDF rows for mean-shifted conditional coding.

    Row j is a discretized N(center, scale_table[j]^2) over w in [0, levels)
    with center = levels//2; the coder transmits w = (s - round(mu) + center)
    mod levels, so the distribution of w is the residual distribution
    recentred — one row per scale bin instead of one per (mean, scale) pair.
    Tail mass outside the window is folded into the edge bins (the mod-levels
    wrap makes any symbol decodable regardless)."""
    scales = np.asarray(scale_table, np.float64)
    center = levels // 2
    edges = np.arange(levels + 1, dtype=np.float64) - 0.5 - center  # [L+1]
    upper = _ndtr(edges[None, 1:] / scales[:, None])
    lower = _ndtr(edges[None, :-1] / scales[:, None])
    pmf = upper - lower
    pmf[:, 0] += lower[:, 0]          # fold left tail
    pmf[:, -1] += 1.0 - upper[:, -1]  # fold right tail
    return quantize_pmf(pmf, precision)


def _ndtr(x: np.ndarray) -> np.ndarray:
    """Standard normal CDF via erf (numpy-only)."""
    import math

    return 0.5 * (1.0 + np.vectorize(math.erf)(x / np.sqrt(2.0)))


def estimate_bits(symbols: np.ndarray, cdf: np.ndarray, precision: int = 16) -> float:
    """Shannon estimate (in bits) of coding `symbols` with the quantized
    tables; channel of flattened symbol i is i % C. Used to sanity-check the
    coder's output size (should match within the rANS ~32-bit flush overhead).
    """
    c = cdf.shape[0]
    flat = symbols.reshape(-1).astype(np.int64)
    ch = np.arange(flat.size) % c
    freq = (cdf[ch, flat + 1] - cdf[ch, flat]).astype(np.float64)
    return float(np.sum(-np.log2(freq / (1 << precision))))

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Entropy-coder throughput: C++ rANS (ctypes) vs the pure-Python twin.

The host coder sits on the decode critical path (one stream per plane/tile),
so its symbol throughput bounds end-to-end images/s once the TPU transforms
are fast. A 768x512 image is 196,608 latent symbols per plane pass.

Usage: python benchmarks/rans_bench.py [--symbols N]
Prints one JSON line per engine/direction.
"""
import argparse
import json
import time

import numpy as np

from neural_network_image_compression_tpu.coding import cdf as cdf_mod
from neural_network_image_compression_tpu.coding import rans


def bench(n_symbols: int, channels: int = 32, seed: int = 0) -> list[dict]:
    rng = np.random.default_rng(seed)
    # Peaky symbol distribution like a trained integer-grid latent.
    pmf = np.exp(-0.5 * ((np.arange(256) - 128.0) / 4.0) ** 2)
    pmf = np.tile(pmf / pmf.sum(), (channels, 1))
    cdf = cdf_mod.quantize_pmf(pmf, 16)
    sym = np.clip(
        np.round(rng.normal(128, 4, n_symbols)), 0, 255
    ).astype(np.uint8).reshape(-1, channels)

    rows = []
    blob = rans.encode(sym, cdf, 16)
    bpp_equiv = 8 * len(blob) / n_symbols

    def timeit(fn, reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        return out, (time.perf_counter() - t0) / reps

    _, t_enc = timeit(lambda: rans.encode(sym, cdf, 16))
    dec, t_dec = timeit(lambda: rans.decode(blob, n_symbols, cdf, 16))
    assert np.array_equal(dec.reshape(sym.shape), sym)
    rows.append({"engine": "cpp-rans32", "encode_msym_s": round(n_symbols / t_enc / 1e6, 2),
                 "decode_msym_s": round(n_symbols / t_dec / 1e6, 2),
                 "bits_per_symbol": round(bpp_equiv, 3)})

    # rans64: 64-bit state, u32 renorm, 4 interleaved states — the serving
    # decode path (container flag bit4, CodecConfig.coder default).
    blob64 = rans.encode64(sym, cdf, 16)
    _, t_enc64 = timeit(lambda: rans.encode64(sym, cdf, 16))
    dec64, t_dec64 = timeit(lambda: rans.decode64(blob64, n_symbols, cdf, 16))
    assert np.array_equal(dec64.reshape(sym.shape), sym)
    rows.append({"engine": "cpp-rans64x4",
                 "encode_msym_s": round(n_symbols / t_enc64 / 1e6, 2),
                 "decode_msym_s": round(n_symbols / t_dec64 / 1e6, 2),
                 "bits_per_symbol": round(8 * len(blob64) / n_symbols, 3)})

    # Python twin on a smaller slice (it is ~1000x slower; scale the count).
    n_py = min(n_symbols, 32 * 512)
    sym_py = sym.reshape(-1)[:n_py].reshape(-1, channels)
    blob_py = rans.encode_py(sym_py.reshape(-1), cdf, 16)
    _, t_enc_py = timeit(lambda: rans.encode_py(sym_py.reshape(-1), cdf, 16), reps=1)
    dec_py, t_dec_py = timeit(
        lambda: rans.decode_py(blob_py, n_py, cdf, 16), reps=1
    )
    assert np.array_equal(dec_py, sym_py.reshape(-1))
    rows.append({"engine": "python-twin",
                 "encode_msym_s": round(n_py / t_enc_py / 1e6, 3),
                 "decode_msym_s": round(n_py / t_dec_py / 1e6, 3)})
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--symbols", type=int, default=32 * 96 * 64 * 32)
    args = p.parse_args()
    for row in bench(args.symbols):
        print(json.dumps(row))


if __name__ == "__main__":
    main()

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Per-stage HBM/FLOP accounting + engine A/B for the GDN flagship.

VERDICT r4 item 3: produce a stage-by-stage traffic table for the flagship
round-trip and measure whether fusing GDN into the Pallas conv epilogue
(ops/pallas_conv.py `_epilogue`) buys back the unfused norm's HBM
round-trips. Prints the analytic table (utils/flops.py stage_table), then
times the jitted round-trip for backend in {xla, pallas} at the bench batch.

Usage: python benchmarks/hbm_table.py [--batch 128] [--dtype bfloat16|float32]
"""
import argparse
import dataclasses
import json
import time

import numpy as np

H, W = 512, 768


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--table-only", action="store_true")
    args = p.parse_args()

    from neural_network_image_compression_tpu.utils.flops import (
        chip_peak_hbm_gbps,
        chip_peak_tflops,
        round_trip_flops,
        round_trip_hbm_bytes,
        stage_table,
    )

    itemsize = 2 if args.dtype == "bfloat16" else 4
    rows = stage_table("base", H, W, itemsize=itemsize, activation="gdn")
    print(f"# per-stage accounting, ONE plane, {H}x{W}, {args.dtype}")
    print(f"{'stack':<10} {'layer':<18} {'GFLOP':>7} {'HBM MB':>7} "
          f"{'+GDN GFLOP':>10} {'+GDN MB (unfused)':>17}")
    tot = dict(g=0.0, m=0.0, gg=0.0, gm=0.0)
    for r in rows:
        print(f"{r['stack']:<10} {r['layer']:<18} {r['gflops']:>7.2f} "
              f"{r['hbm_mb_ideal']:>7.2f} {r['gdn_gflops']:>10.2f} "
              f"{r['gdn_hbm_mb_unfused']:>17.2f}")
        tot["g"] += r["gflops"]; tot["m"] += r["hbm_mb_ideal"]
        tot["gg"] += r["gdn_gflops"]; tot["gm"] += r["gdn_hbm_mb_unfused"]
    print(f"{'TOTAL':<10} {'(x3 planes/img)':<18} {tot['g']:>7.2f} "
          f"{tot['m']:>7.2f} {tot['gg']:>10.2f} {tot['gm']:>17.2f}")
    frac = tot["gm"] / (tot["m"] + tot["gm"])
    print(f"# unfused GDN share of round-trip traffic: {100*frac:.1f}%")
    if args.table_only:
        return

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/nnic_jax_cache"),
    )
    from neural_network_image_compression_tpu.config import flagship
    from neural_network_image_compression_tpu.models import NeuralCodec

    kind = jax.devices()[0].device_kind
    fl = round_trip_flops("base", H, W, "gdn")
    hb = round_trip_hbm_bytes("base", H, W, itemsize, "gdn")
    # The pallas path pads the early convs' channels to the 128-lane MXU
    # width, which multiplies its peak HBM footprint; batch 128 fits for
    # XLA but OOMs for pallas on a 16G chip — fall back through smaller
    # batches per backend and report per-image rates.
    for backend in ("xla", "pallas"):
        for batch in (args.batch, args.batch // 2, args.batch // 4):
            cfg = flagship()
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, backend=backend, compute_dtype=args.dtype
                ),
            )
            codec = NeuralCodec(cfg)
            params = codec.init(jax.random.key(0), (H, W))
            rgb = jax.device_put(
                np.random.default_rng(0).integers(
                    0, 256, (batch, H, W, 3), dtype=np.uint8
                )
            )

            @jax.jit
            def run(p, x, i):
                out = codec.forward(p, x + i.astype(jnp.uint8))
                return out.astype(jnp.float32).mean()

            try:
                float(run(params, rgb, jnp.uint8(0)))
            except Exception as e:
                print(json.dumps({
                    "backend": backend, "batch": batch,
                    "error": f"{type(e).__name__}"[:40] + ": " + str(e)[:100],
                }))
                continue
            t0 = time.perf_counter()
            last = None
            for i in range(args.iters):
                last = run(params, rgb, jnp.uint8(i))
            float(last)
            dt = time.perf_counter() - t0
            rate = batch * args.iters / dt
            out = {
                "backend": backend,
                "dtype": args.dtype,
                "batch": batch,
                "images_per_s": round(rate, 1),
                "mfu": round(rate * fl / 1e12 / (chip_peak_tflops(kind) or 1), 4),
                "hbm_util_vs_ideal": round(
                    rate * hb / 1e9 / (chip_peak_hbm_gbps(kind) or 1), 4
                ),
                "device_kind": kind,
            }
            print(json.dumps(out))
            break


if __name__ == "__main__":
    main()

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Training-step throughput on one chip (VERDICT r4 item 6).

Times the jitted R-D train step (training/train_step.py) for the flagship
config at serving-relevant batches and reports images/s + MFU with the same
roofline treatment bench.py applies to inference. FLOP model: backward of a
conv stack costs ~2x its forward (grad wrt inputs + grad wrt weights), so a
train step is ~3x the forward transforms; the rate model/entropy terms are
<2% and excluded, making the reported MFU a slight UNDER-estimate.

Usage: python benchmarks/train_bench.py [--batch 64,128] [--act gdn]
Prints one JSON line per batch size.
"""
import argparse
import dataclasses
import json
import time

import numpy as np

PATCH = 128


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default="64,128")
    p.add_argument("--act", default="gdn", choices=["gdn", "leaky_relu"])
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/nnic_jax_cache"),
    )
    from neural_network_image_compression_tpu.config import flagship
    from neural_network_image_compression_tpu.models import NeuralCodec
    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )
    from neural_network_image_compression_tpu.utils.flops import (
        chip_peak_tflops,
        round_trip_flops,
    )

    kind = jax.devices()[0].device_kind
    fwd = round_trip_flops(
        "base", PATCH, PATCH, args.act if args.act == "gdn" else "preset_default"
    )
    train_flops = 3 * fwd  # fwd + ~2x bwd of the transforms
    for batch in (int(b) for b in args.batch.split(",")):
        cfg = flagship()
        if args.act != "gdn":
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(cfg.model, activation="leaky_relu"),
            )
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=batch)
        )
        codec = NeuralCodec(cfg)
        state = init_train_state(codec, jax.random.key(0), cfg)
        step = jax.jit(make_train_step(codec, cfg), donate_argnums=0)
        imgs = np.random.default_rng(0).integers(
            0, 256, (batch, PATCH, PATCH, 3), dtype=np.uint8
        )
        imgs = jax.device_put(imgs)
        state, m = step(state, imgs, jax.random.key(1))
        float(m["loss"])  # compile + warm
        t0 = time.perf_counter()
        last = None
        for i in range(args.iters):
            state, last = step(state, imgs, jax.random.key(i + 2))
        float(last["loss"])  # fetch a scalar -> all steps executed
        dt = time.perf_counter() - t0
        rate = batch * args.iters / dt
        achieved = rate * train_flops / 1e12
        peak = chip_peak_tflops(kind) or 0
        print(json.dumps({
            "metric": "train_step_images_per_s",
            "activation": args.act,
            "batch": batch,
            "patch": PATCH,
            "images_per_s": round(rate, 1),
            "steps_per_s": round(rate / batch, 2),
            "train_gflop_per_image": round(train_flops / 1e9, 2),
            "achieved_tflops": round(achieved, 2),
            "mfu": round(achieved / peak, 4) if peak else None,
            "device_kind": kind,
        }))


if __name__ == "__main__":
    main()

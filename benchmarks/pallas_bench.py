import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Kernel-level benchmark: Pallas vs XLA transforms on the real TPU.

Usage: python benchmarks/pallas_bench.py [batch]
Times the base-preset analysis and synthesis transforms both ways with the
scan-amortized scalar-checksum harness (see bench.py for why plain
block_until_ready timing lies on this platform).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.models import (
    AnalysisTransform,
    SynthesisTransform,
)
from neural_network_image_compression_tpu.ops import pallas_conv as pc

H, W = 512, 768
ITERS = 10


def timeit(fn, *args):
    """Returns seconds/call, or None if this configuration fails to compile
    (e.g. the f32 conv3x3 kernel's scoped-VMEM stack overflows at large
    batch x 128-channel shapes — runs_r3/pallas_bench.log)."""
    @jax.jit
    def run(*a):
        def body(carry, i):
            out = fn(*a[:-1], a[-1] + i.astype(a[-1].dtype) * 1e-6)
            return carry + out.astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return total

    try:
        float(run(*args))  # compile+warm
    except Exception as e:  # noqa: BLE001 — report and keep benchmarking
        msg = (str(e).splitlines() or ["<no message>"])[0][:100]
        print(f"  [config failed: {type(e).__name__}: {msg}]")
        return None
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / ITERS


def bench_preset(preset: str, batch: int, dtype) -> None:
    rng = np.random.default_rng(0)
    ds = 16 if preset == "deep" else 8
    x = jnp.asarray(rng.random((batch, H, W, 1)).astype(np.float32), dtype)
    lat = jnp.asarray(
        rng.random((batch, H // ds, W // ds, 32)).astype(np.float32), dtype
    )

    ana = AnalysisTransform(preset=preset)
    pa = jax.tree_util.tree_map(
        lambda v: v.astype(dtype), ana.init(jax.random.key(0), x[:1])["params"]
    )
    syn = SynthesisTransform(preset=preset)
    ps = jax.tree_util.tree_map(
        lambda v: v.astype(dtype), syn.init(jax.random.key(1), lat[:1])["params"]
    )

    pal_a = pc.pallas_analysis_base if preset == "base" else pc.pallas_analysis_deep
    pal_s = pc.pallas_synthesis_base if preset == "base" else pc.pallas_synthesis_deep
    t_xla_a = timeit(lambda p, v: ana.apply({"params": p}, v), pa, x)
    t_pal_a = timeit(lambda p, v: pal_a(p, v), pa, x)
    t_tap_a = timeit(lambda p, v: pal_a(p, v, tap_concat=True), pa, x)
    t_xla_s = timeit(lambda p, v: syn.apply({"params": p}, v), ps, lat)
    t_pal_s = timeit(lambda p, v: pal_s(p, v), ps, lat)
    t_tap_s = timeit(lambda p, v: pal_s(p, v, tap_concat=True), ps, lat)

    def row(name, t):
        if t is None:
            print(f"  {name:24s}      n/a (compile failed)")
        else:
            print(f"  {name:24s} {t*1e3:8.2f} ms/call  {batch/t:8.1f} img/s")

    print(f"[{preset} preset, {np.dtype(dtype).name}]")
    row("analysis  XLA", t_xla_a)
    row("analysis  pallas", t_pal_a)
    row("analysis  pallas+tap", t_tap_a)
    row("synthesis XLA", t_xla_s)
    row("synthesis pallas", t_pal_s)
    row("synthesis pallas+tap", t_tap_s)
    if all(t is not None for t in (t_xla_a, t_pal_a, t_tap_a, t_xla_s, t_pal_s, t_tap_s)):
        print(f"  pallas/XLA speed: analysis {t_xla_a/t_pal_a:.2f}x "
              f"(tap {t_xla_a/t_tap_a:.2f}x), "
              f"synthesis {t_xla_s/t_pal_s:.2f}x (tap {t_xla_s/t_tap_s:.2f}x)")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    presets = sys.argv[2].split(",") if len(sys.argv) > 2 else ["base", "deep"]
    dtypes = [jnp.float32, jnp.bfloat16]
    for preset in presets:
        for dtype in dtypes:
            bench_preset(preset, batch, dtype)


if __name__ == "__main__":
    main()

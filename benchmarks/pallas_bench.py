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
    @jax.jit
    def run(*a):
        def body(carry, i):
            out = fn(*a[:-1], a[-1] + i.astype(a[-1].dtype) * 1e-6)
            return carry + out.astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return total

    float(run(*args))  # compile+warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, H, W, 1)).astype(np.float32))
    lat = jnp.asarray(rng.random((batch, H // 8, W // 8, 32)).astype(np.float32))

    ana = AnalysisTransform(preset="base")
    pa = ana.init(jax.random.key(0), x[:1])["params"]
    syn = SynthesisTransform(preset="base")
    ps = syn.init(jax.random.key(1), lat[:1])["params"]

    t_xla_a = timeit(lambda p, v: ana.apply({"params": p}, v), pa, x)
    t_pal_a = timeit(lambda p, v: pc.pallas_analysis_base(p, v), pa, x)
    t_xla_s = timeit(lambda p, v: syn.apply({"params": p}, v), ps, lat)
    t_pal_s = timeit(lambda p, v: pc.pallas_synthesis_base(p, v), ps, lat)

    def row(name, t):
        print(f"{name:24s} {t*1e3:8.2f} ms/call  {batch/t:8.1f} img/s")

    row("analysis  XLA", t_xla_a)
    row("analysis  pallas", t_pal_a)
    row("synthesis XLA", t_xla_s)
    row("synthesis pallas", t_pal_s)
    print(f"pallas/XLA speed: analysis {t_xla_a/t_pal_a:.2f}x, "
          f"synthesis {t_xla_s/t_pal_s:.2f}x")


if __name__ == "__main__":
    main()

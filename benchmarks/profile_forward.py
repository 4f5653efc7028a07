import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Stage-level timing of the flagship forward path on the real chip.

Answers "where do the 2.9 ms/image go?" before any kernel tuning: times the
full round-trip, encode/decode halves, each transform, and the colorspace
ends, across batch sizes, in the same scan-amortized scalar-checksum harness
as bench.py (plain block_until_ready lies under this platform's async
tunnel).

Usage: python benchmarks/profile_forward.py [batches...]
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.config import Config, ModelConfig
from neural_network_image_compression_tpu.models import NeuralCodec
from neural_network_image_compression_tpu.ops import colorspace as cspace
from neural_network_image_compression_tpu.ops.quantize import dequantize, quantize

H, W = 512, 768
ITERS = 20


def timeit(fn, *args, perturb=0):
    """Mean seconds per call of fn(*args), ITERS reps in one dispatch."""

    @jax.jit
    def run(*a):
        def body(carry, i):
            a2 = list(a)
            a2[perturb] = a2[perturb] + i.astype(a2[perturb].dtype)
            out = fn(*a2)
            return carry + jnp.asarray(out, jnp.float32).mean(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return total

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    batches = [int(b) for b in sys.argv[1:]] or [1, 4, 8, 16, 32]
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16", backend="auto"))
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0), (H, W))
    print(f"device: {jax.devices()[0].device_kind}")
    for n in batches:
        rng = np.random.default_rng(0)
        rgb = jax.device_put(rng.integers(0, 256, (n, H, W, 3), dtype=np.uint8))
        sym = jax.device_put(
            np.asarray(jax.jit(codec.encode)(params, rgb)).astype(np.uint8)
        )
        planes = jax.device_put(
            rng.random((n, H, W, 3)).astype(np.float32).astype(jnp.bfloat16)
        )
        y1 = jax.device_put(
            rng.random((n, H, W, 1)).astype(np.float32).astype(jnp.bfloat16)
        )
        c2 = jax.device_put(
            rng.random((2 * n, H, W, 1)).astype(np.float32).astype(jnp.bfloat16)
        )
        lat1 = jax.device_put(
            rng.random((n, H // 8, W // 8, 32)).astype(np.float32).astype(jnp.bfloat16)
        )
        lat2 = jax.device_put(
            rng.random((2 * n, H // 8, W // 8, 32)).astype(np.float32)
            .astype(jnp.bfloat16)
        )

        t = {}
        t["forward"] = timeit(codec.forward, params, rgb, perturb=1)
        t["encode"] = timeit(codec.encode, params, rgb, perturb=1)
        t["decode"] = timeit(lambda p, s: codec.decode(p, s), params, sym,
                             perturb=1)
        t["analysis_y(N)"] = timeit(
            lambda p, x: codec._apply_analysis(p["analysis_y"], x), params, y1,
            perturb=1)
        t["analysis_c(2N)"] = timeit(
            lambda p, x: codec._apply_analysis(p["analysis_c"], x), params, c2,
            perturb=1)
        t["synthesis_y(N)"] = timeit(
            lambda p, x: codec._apply_synthesis(p["synthesis_y"], x), params,
            lat1, perturb=1)
        t["synthesis_c(2N)"] = timeit(
            lambda p, x: codec._apply_synthesis(p["synthesis_c"], x), params,
            lat2, perturb=1)
        t["colorspace_fwd"] = timeit(
            lambda x: cspace.rgb_to_planes(x, codec.colorspace), planes)
        t["colorspace_inv"] = timeit(
            lambda x: cspace.planes_to_rgb(x, codec.colorspace), planes)
        t["quant+dequant"] = timeit(
            lambda x: dequantize(quantize(x, codec.levels, codec.grid),
                                 codec.levels, codec.grid), lat1)
        per_img = t["forward"] / n * 1e3
        print(f"\nbatch {n}: forward {per_img:.3f} ms/image "
              f"({n / t['forward']:.1f} img/s)")
        for k, v in t.items():
            print(f"  {k:18s} {v * 1e3 / n:8.3f} ms/img  {v * 1e3:8.3f} ms/call")


if __name__ == "__main__":
    main()

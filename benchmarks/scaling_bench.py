import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Scaling benchmark: data-parallel train-step throughput vs. device count.

Two modes:

- On a real TPU pod slice (`--devices N`, launched per slice size with
  `jax.distributed.initialize` in the launcher): weak scaling — fixed
  per-device batch, global batch grows with the mesh, ideal is constant step
  time / linear images/s. This is the >=90%-linear-scaling harness from
  BASELINE.md.
- On this dev box (default, one physical chip): the mesh is simulated with N
  virtual CPU devices that SHARE one host's cores, so weak scaling cannot
  scale by construction. What *is* measurable is data-parallel overhead:
  run the same global batch on 1 device and sharded over N — ideal is equal
  wall time (XLA:CPU uses the same cores either way), and
  efficiency = t_1dev / t_Ndev isolates the cost of sharding + the gradient
  psum + any hidden serialization.

Usage:
    python benchmarks/scaling_bench.py              # CPU-sim overhead sweep
    python benchmarks/scaling_bench.py --devices N  # one weak-scaling point
"""
import argparse
import json
import subprocess
import time

PER_DEVICE_BATCH = 8
PATCH = 64
STEPS = 3


def run_one(n_devices: int, force_cpu: bool = False,
            global_batch: int | None = None) -> dict:
    import jax

    if force_cpu:
        # The TPU platform plugin overrides the JAX_PLATFORMS env var; CPU
        # must be forced through jax.config before first backend use.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neural_network_image_compression_tpu.config import (
        Config,
        DataConfig,
        TrainConfig,
    )
    from neural_network_image_compression_tpu.models import NeuralCodec
    from neural_network_image_compression_tpu.parallel import make_mesh
    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < n_devices:
        raise SystemExit(
            f"need {n_devices} devices, have {len(jax.devices())}")

    cfg = Config(
        data=DataConfig(patch_size=PATCH),
        train=TrainConfig(
            batch_size=global_batch or PER_DEVICE_BATCH * n_devices
        ),
    )
    codec = NeuralCodec(cfg)
    mesh = make_mesh(data=n_devices)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    state = jax.device_put(
        init_train_state(codec, jax.random.key(0), cfg), replicated)
    step = jax.jit(
        make_train_step(codec, cfg),
        in_shardings=(replicated, sharded, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
    batch = jax.device_put(
        np.random.default_rng(0).integers(
            0, 256, (cfg.train.batch_size, PATCH, PATCH, 3), dtype=np.uint8
        ),
        sharded,
    )
    key = jax.random.key(1)

    state, metrics = step(state, batch, key)  # compile + warm
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    return {
        "devices": n_devices,
        "global_batch": cfg.train.batch_size,
        "step_ms": dt * 1e3,
        "images_per_s": cfg.train.batch_size / dt,
    }


def report_comms(n_devices: int) -> dict:
    """Compile (don't run) the n-device sharded train step and account the
    collective traffic XLA inserted: bytes moved per step by all-reduce /
    all-gather / reduce-scatter / collective-permute. This is the
    hardware-independent half of the scaling story (VERDICT r1 weak item 7):
    the gradient psum volume per step, measurable without a pod."""
    import re

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_network_image_compression_tpu.config import (
        Config,
        DataConfig,
        TrainConfig,
    )
    from neural_network_image_compression_tpu.models import NeuralCodec
    from neural_network_image_compression_tpu.parallel import make_mesh
    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )

    cfg = Config(
        data=DataConfig(patch_size=PATCH),
        train=TrainConfig(batch_size=PER_DEVICE_BATCH * n_devices),
    )
    codec = NeuralCodec(cfg)
    mesh = make_mesh(data=n_devices)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    state = jax.device_put(
        init_train_state(codec, jax.random.key(0), cfg), replicated)
    step = jax.jit(
        make_train_step(codec, cfg),
        in_shardings=(replicated, sharded, replicated),
        out_shardings=(replicated, replicated),
    )
    batch = jax.ShapeDtypeStruct(
        (cfg.train.batch_size, PATCH, PATCH, 3), np.uint8, sharding=sharded
    )
    txt = step.lower(state, batch, jax.random.key(1)).compile().as_text()

    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "u8": 1, "s32": 4,
                   "u32": 4, "f64": 8, "s8": 1, "pred": 1}
    per_op: dict[str, int] = {}
    op_pat = re.compile(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start)?\("
    )
    shape_pat = re.compile(r"\b([a-z]+[0-9]*)\[([0-9,]*)\](?:\{[0-9,]*\})?")
    for line in txt.splitlines():
        if "=" not in line:
            continue
        rhs = line.split("=", 1)[1]
        m = op_pat.search(rhs)
        if m is None:
            continue
        # result shapes sit between '=' and the op token
        total = 0
        for sm in shape_pat.finditer(rhs[: m.start()]):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes.get(dt, 4)
        if total:
            per_op[m.group(1)] = per_op.get(m.group(1), 0) + total
    params_bytes = sum(
        np.prod(np.shape(x)) * 4
        for x in jax.tree_util.tree_leaves(state.params)
    )
    return {
        "devices": n_devices,
        "global_batch": cfg.train.batch_size,
        "collective_bytes_per_step": per_op,
        "total_collective_mb": round(sum(per_op.values()) / 1e6, 3),
        "param_mb": round(float(params_bytes) / 1e6, 3),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=None,
                        help="run one point on the current jax.devices() mesh")
    parser.add_argument("--sweep", type=str, default="1,2,4,8")
    parser.add_argument("--force-cpu", action="store_true")
    parser.add_argument("--global-batch", type=int, default=None)
    parser.add_argument("--comms", type=int, default=None, metavar="N",
                        help="compile the N-device step and report collective "
                             "bytes/step (no execution; any platform)")
    args = parser.parse_args()

    if args.comms is not None:
        import jax

        if args.force_cpu:
            jax.config.update("jax_platforms", "cpu")
        print(json.dumps(report_comms(args.comms)))
        return

    if args.devices is not None:
        print(json.dumps(run_one(args.devices, force_cpu=args.force_cpu,
                                 global_batch=args.global_batch)))
        return

    def child(n_virtual: int, mesh_devices: int, global_batch: int) -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_virtual}"
        ).strip()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--devices", str(mesh_devices), "--force-cpu",
             "--global-batch", str(global_batch)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    for n in [int(s) for s in args.sweep.split(",")]:
        b = PER_DEVICE_BATCH * n
        single = child(1, 1, b)
        sharded = child(n, n, b) if n > 1 else single
        eff = single["step_ms"] / sharded["step_ms"]
        print(
            f"devices {n:2d}  global_batch {b:4d}"
            f"  1-dev {single['step_ms']:7.1f} ms"
            f"  sharded {sharded['step_ms']:7.1f} ms"
            f"  dp-overhead-efficiency {eff*100:5.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()

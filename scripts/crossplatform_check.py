import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Cross-platform decode check for deterministic containers.

PARITY.md's portability claim, verified instead of asserted (ADVICE r2):
encode kodim21 into a det container on one JAX backend, decode it on a
DIFFERENT backend in a fresh subprocess. decompress_image verifies the
latent-symbol CRC internally, so any encoder/decoder disagreement on the
conditional params or CDF tables fails loudly — a clean exit IS the proof
of symbol-exact cross-platform decode.

Run on the machine with the TPU attached:
    python scripts/crossplatform_check.py [--run runs_r2/int_l001]
Directions exercised: tpu-encode -> cpu-decode and cpu-encode -> tpu-decode.
A float-mode (deterministic=False) control is also decoded cross-platform
and reported: if it fails its CRC, that demonstrates the det machinery is
load-bearing, not vacuous (float results may still coincide on some
checkpoints; the control is informational).
"""
import argparse
import dataclasses
import hashlib
import json
import subprocess


def _codec(run_dir: str, det: bool):
    from neural_network_image_compression_tpu.cli import _load_run
    from neural_network_image_compression_tpu.models import NeuralCodec

    codec, params = _load_run(run_dir)
    cfg = codec.cfg.replace(
        codec=dataclasses.replace(
            codec.cfg.codec, deterministic=det, bitstream="rans"
        )
    )
    return NeuralCodec(cfg), params


def _phase_encode(args) -> None:
    import jax
    import numpy as np

    from neural_network_image_compression_tpu.coding.codec_stream import (
        compress_image,
    )
    from neural_network_image_compression_tpu.data.io import load_image

    codec, params = _codec(args.run, args.det)
    img = load_image(args.image)
    blob = compress_image(codec, params, np.asarray(img))
    with open(args.container, "wb") as f:
        f.write(blob)
    print(json.dumps({
        "phase": "encode", "platform": jax.devices()[0].platform,
        "det": args.det, "bytes": len(blob),
        "sha256": hashlib.sha256(blob).hexdigest()[:16],
    }))


def _phase_decode(args) -> None:
    import jax
    import numpy as np

    from neural_network_image_compression_tpu.coding.codec_stream import (
        decompress_image,
    )

    codec, params = _codec(args.run, args.det)
    with open(args.container, "rb") as f:
        blob = f.read()
    rec = decompress_image(codec, params, blob)  # raises on CRC mismatch
    print(json.dumps({
        "phase": "decode", "platform": jax.devices()[0].platform,
        "det": args.det, "crc": "ok",
        "recon_sha256": hashlib.sha256(np.ascontiguousarray(rec).tobytes())
        .hexdigest()[:16],
    }))


def _sub(phase: str, args, det: bool, container: str, cpu: bool):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if cpu:
        env["NIC_FORCE_CPU"] = "1"
    else:
        env.pop("NIC_FORCE_CPU", None)
    cmd = [sys.executable, os.path.abspath(__file__), phase,
           "--run", args.run, "--image", args.image, "--container", container]
    if det:
        cmd.append("--det")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=900)
    out = r.stdout.strip().splitlines()
    return r.returncode, (out[-1] if out else ""), r.stderr[-2000:]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("phase", nargs="?", default="drive",
                        choices=["drive", "encode", "decode"])
    parser.add_argument("--run", default="runs_r2/int_l001")
    parser.add_argument("--image",
                        default="/root/reference/data/kodak_img/kodim21.png")
    parser.add_argument("--container", default="/tmp/xplat.nic")
    parser.add_argument("--det", action="store_true")
    args = parser.parse_args()

    if args.phase != "drive":
        if os.environ.get("NIC_FORCE_CPU"):
            import jax

            jax.config.update("jax_platforms", "cpu")
        {"encode": _phase_encode, "decode": _phase_decode}[args.phase](args)
        return

    results = {}
    for direction, enc_cpu, dec_cpu in (
        ("tpu_encode__cpu_decode", False, True),
        ("cpu_encode__tpu_decode", True, False),
    ):
        path = args.container + (".a" if enc_cpu else ".b")
        rc_e, out_e, err_e = _sub("encode", args, True, path, enc_cpu)
        if rc_e != 0:
            results[direction] = {"ok": False, "stage": "encode", "err": err_e}
            continue
        rc_d, out_d, err_d = _sub("decode", args, True, path, dec_cpu)
        results[direction] = {
            "ok": rc_d == 0,
            "encode": json.loads(out_e),
            "decode": json.loads(out_d) if rc_d == 0 else err_d,
        }
    # informational float control: tpu encode, cpu decode, det off
    rc_e, out_e, err_e = _sub("encode", args, False, args.container + ".f", False)
    if rc_e == 0:
        rc_d, out_d, err_d = _sub("decode", args, False, args.container + ".f", True)
        results["float_control_tpu__cpu"] = {
            "decodes": rc_d == 0,
            "note": "float conditionals are platform-locked by design; a CRC "
                    "failure here shows det mode is load-bearing",
            "detail": (json.loads(out_d) if rc_d == 0
                       else err_d.strip().splitlines()[-1:]),
        }
    print(json.dumps(results, indent=2))
    ok = all(v.get("ok") for k, v in results.items() if not k.startswith("float"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

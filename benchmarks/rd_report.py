import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""R-D report across training runs.

For every given run dir, measures on the validation directory:
- the run's OWN bitstream (rans / two-pass context rans / reference PNG):
  mean bpp, PSNR, MS-SSIM;
- the reference's rate definition (8 * optimized-PNG bytes of the packed
  latent / pixels) on the SAME latents — the apples-to-apples DEFLATE
  comparison for every rANS run.

Usage: python benchmarks/rd_report.py runs/l010 runs/ctxanneal ... [--val DIR]
Prints one JSON line per run plus a markdown table.
"""
import argparse
import json

import numpy as np


def report_run(run_dir: str, val_dir: str, adaptive: bool | None = None,
               deterministic: bool | None = None) -> dict:
    import jax.numpy as jnp

    from neural_network_image_compression_tpu.cli import _load_run
    from neural_network_image_compression_tpu.data.io import (
        list_images,
        load_image,
        png_num_bytes,
    )
    from neural_network_image_compression_tpu.coding.codec_stream import (
        jitted_codec_fns,
    )
    from neural_network_image_compression_tpu.evaluation.pipelines import rd_point
    from neural_network_image_compression_tpu.ops import pack_planes

    codec, params = _load_run(run_dir)
    if adaptive is not None or deterministic is not None:
        import dataclasses

        from neural_network_image_compression_tpu.models import NeuralCodec

        cfg = codec.cfg
        if adaptive is not None:
            cfg = cfg.replace(
                entropy=dataclasses.replace(cfg.entropy, adaptive_tables=adaptive)
            )
        if deterministic is not None:
            cfg = cfg.replace(
                codec=dataclasses.replace(cfg.codec, deterministic=deterministic)
            )
        codec = NeuralCodec(cfg)
    r = rd_point(codec, params, val_dir)
    png_bpps = []
    for name in list_images(val_dir):
        img = load_image(os.path.join(val_dir, name))
        if img is None:
            continue
        sym = np.asarray(jitted_codec_fns(codec)[0](params, img[None]))
        packed = np.asarray(pack_planes(jnp.asarray(sym)))[0]
        png_bpps.append(
            8.0 * png_num_bytes(packed) / (img.shape[0] * img.shape[1])
        )
    files = r.get("files", [])
    out = {
        "run": run_dir,
        "bitstream": codec.cfg.codec.bitstream,
        "context": codec.cfg.entropy.context
        if hasattr(codec.cfg.entropy, "context")
        else "none",
        "mean_bpp": round(r["mean_bpp"], 4),
        "mean_psnr": round(r["mean_psnr"], 3),
        "mean_ms_ssim": round(r["mean_ms_ssim"], 5),
        "png_rate_same_latents_bpp": round(float(np.mean(png_bpps)), 4),
    }
    if len(files) > 1:  # spread across the eval set (means +- std)
        out["std_bpp"] = round(float(np.std([f.bpp for f in files])), 4)
        out["std_psnr"] = round(float(np.std([f.psnr for f in files])), 3)
        out["n_images"] = len(files)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("runs", nargs="+")
    parser.add_argument("--val", default="/root/reference/data/kodak_img")
    parser.add_argument("--cpu", action="store_true",
                        help="force XLA:CPU (leave the TPU to training jobs)")
    parser.add_argument("--adaptive", action="store_true",
                        help="enable per-image adaptive tables regardless of "
                             "the run's stored config")
    parser.add_argument("--deterministic", action="store_true",
                        help="fixed-point (platform-portable) conditional "
                             "inference — measures the det-mode rate cost")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    rows = []
    for run in args.runs:
        row = report_run(
            run, args.val,
            adaptive=True if args.adaptive else None,
            deterministic=True if args.deterministic else None,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    print()
    print("| run | coder | bpp | PSNR | MS-SSIM | PNG-rate same latents |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        suffix = {"checkerboard": "+ctx", "hyperprior": "+hyper"}.get(
            r["context"], ""
        )
        coder = r["bitstream"] + (suffix if r["bitstream"] != "png" else "")
        print(
            f"| {r['run']} | {coder} | {r['mean_bpp']} | {r['mean_psnr']} "
            f"| {r['mean_ms_ssim']} | {r['png_rate_same_latents_bpp']} |"
        )


if __name__ == "__main__":
    main()

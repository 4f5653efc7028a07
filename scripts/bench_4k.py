import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""4K-class encode on the real chip (VERDICT r4 item 8).

The 2-D tiled path is correctness-tested on the 8-virtual-device CPU mesh;
this script shows it compiles and fits ON HARDWARE and records throughput.
One chip means a 1x1 tile grid (tiles == devices), so the tiled run
exercises the shard_map/halo machinery end-to-end while the whole-image run
is the control; multi-tile grids need more chips (dryrun covers (2,4)).

Builds a 3840x2160 test image by mosaicking held-out patches (never-trained
content), then times:
  - whole-image compress/decompress (codec_stream)
  - tiled compress/decompress through parallel/spatial.py, 1x1 mesh grid

Usage: python scripts/bench_4k.py [--run runs_r3/gdn_l001] [--reps 3]
"""
import argparse
import json
import time

import numpy as np


def build_4k(patch_dir: str, h: int = 2160, w: int = 3840) -> np.ndarray:
    from neural_network_image_compression_tpu.data.io import list_images, load_image

    names = sorted(list_images(patch_dir))
    rng = np.random.default_rng(4)
    rng.shuffle(names)
    ph = pw = 128
    gh, gw = -(-h // ph), -(-w // pw)
    canvas = np.zeros((gh * ph, gw * pw, 3), np.uint8)
    k = 0
    for i in range(gh):
        for j in range(gw):
            img = load_image(os.path.join(patch_dir, names[k % len(names)]))
            k += 1
            canvas[i * ph : (i + 1) * ph, j * pw : (j + 1) * pw] = img
    return canvas[:h, :w]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs_r3/gdn_l001")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--patches", default="data/heldout_patches")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/nnic_jax_cache"),
    )
    from jax.sharding import Mesh

    from neural_network_image_compression_tpu.cli import _load_run
    from neural_network_image_compression_tpu.coding import (
        build_tables,
        compress_image,
        decompress_image,
    )
    from neural_network_image_compression_tpu.parallel.spatial import (
        compress_image_tiled_2d,
        decompress_image_tiled_2d,
    )

    img = build_4k(args.patches)
    px = img.shape[0] * img.shape[1]
    codec, params = _load_run(args.run)
    tables = build_tables(codec, params)

    blob = compress_image(codec, params, img, tables=tables)  # warm/compile
    out = decompress_image(codec, params, blob, tables=tables)
    assert out.shape == img.shape
    t0 = time.perf_counter()
    for _ in range(args.reps):
        blob = compress_image(codec, params, img, tables=tables)
    t_enc = (time.perf_counter() - t0) / args.reps
    t0 = time.perf_counter()
    for _ in range(args.reps):
        decompress_image(codec, params, blob, tables=tables)
    t_dec = (time.perf_counter() - t0) / args.reps
    print(json.dumps({
        "mode": "whole_image", "hw": list(img.shape[:2]),
        "bpp": round(8 * len(blob) / px, 4),
        "compress_s": round(t_enc, 3), "decompress_s": round(t_dec, 3),
        "mpix_per_s_encode": round(px / t_enc / 1e6, 2),
        "device": jax.devices()[0].device_kind,
    }))

    devs = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, ("sph", "spw"))
    blob2 = compress_image_tiled_2d(codec, params, img, mesh, tables=tables)
    out2 = decompress_image_tiled_2d(codec, params, blob2, mesh, tables=tables)
    assert out2.shape == img.shape
    # Tiled vs whole-image agreement on hardware. Each decompress
    # checksum-verifies its own encoder's symbols internally; the two
    # ENCODERS are different compiled programs (shard_map vs plain), and on
    # the bf16 TPU path the compile-variant rounding flips a visible share
    # of borderline latent symbols by one level, which the synthesis then
    # spreads over many pixels each. A real halo/geometry bug corrupts tile
    # content wholesale — gate on reconstruction agreement (PSNR between
    # the two outputs), report the raw diff stats alongside.
    diff = np.abs(out.astype(int) - out2.astype(int))
    mse = float((diff.astype(np.float64) ** 2).mean())
    psnr_cross = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
    assert psnr_cross > 35.0, f"tiled decode diverges: psnr={psnr_cross:.1f}"
    agreement = {
        "tiled_vs_whole_psnr": round(psnr_cross, 2),
        "pixel_diff_frac": round(float((diff > 0).mean()), 6),
        "pixel_diff_max": int(diff.max()),
    }
    t0 = time.perf_counter()
    for _ in range(args.reps):
        blob2 = compress_image_tiled_2d(codec, params, img, mesh, tables=tables)
    t_enc = (time.perf_counter() - t0) / args.reps
    t0 = time.perf_counter()
    for _ in range(args.reps):
        decompress_image_tiled_2d(codec, params, blob2, mesh, tables=tables)
    t_dec = (time.perf_counter() - t0) / args.reps
    print(json.dumps({
        "mode": "tiled_2d_1x1", "hw": list(img.shape[:2]),
        "bpp": round(8 * len(blob2) / px, 4),
        "compress_s": round(t_enc, 3), "decompress_s": round(t_dec, 3),
        "mpix_per_s_encode": round(px / t_enc / 1e6, 2),
        **agreement,
    }))


if __name__ == "__main__":
    main()

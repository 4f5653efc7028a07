"""File-level codec pipelines and R-D evaluation tools.

Capability parity:
- ``compress_directory`` / ``decompress_directory`` mirror the reference's
  ``Encoder.compress`` / ``Decoder.uncompress`` batch drivers (reference
  tf2_0/src/encoder.py:49-51, decoder.py:50-52, utils.py:46-62): whole input
  directory -> ``<dir>_compressed`` / ``*_uncompressed`` outputs. Two
  bitstream modes: 'rans' (real entropy-coded .nic containers) and 'png'
  (reference-parity packed-latent optimized PNGs whose file size IS the rate,
  reference tf2_0/src/utils.py:42-43).
- ``evaluate_directories`` is the MS-SSIM/PSNR dir comparator
  (reference tf1_13/tests/calc_ssim.py) with filename matching by stem.
- ``rd_point`` produces (bpp, PSNR, MS-SSIM) for a validation directory —
  the reference's per-file ``val_bpp.txt`` report (tf2_0/src/training.py:
  157-163) plus quality in one pass, without touching disk.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.coding import (
    build_tables,
    compress_image,
    decompress_image,
)
from neural_network_image_compression_tpu.data.io import (
    list_images,
    load_image,
    png_num_bytes,
    save_png,
)
from neural_network_image_compression_tpu.ops import (
    ms_ssim,
    pack_planes,
    psnr,
    unpack_planes,
)


@dataclass
class FileResult:
    name: str
    num_bytes: int
    bpp: float
    psnr: float | None = None
    ms_ssim: float | None = None


def compress_directory(
    codec,
    params,
    dataset_path: str,
    output_dir: str | None = None,
    tables=None,
    password: str | None = None,
) -> list[FileResult]:
    """Compress every image; writes ``<stem>.nic`` (rans) or ``<stem>.png``
    (reference-parity packed latent). Returns per-file rate results and a
    ``val_bpp.txt`` rate table like the reference's."""
    mode = codec.cfg.codec.bitstream
    if output_dir is None:
        output_dir = dataset_path + "_compressed"  # reference naming
    os.makedirs(output_dir, exist_ok=True)
    if mode in ("rans", "auto") and tables is None:
        tables = build_tables(codec, params)
    results = []
    for name in list_images(dataset_path):
        img = load_image(os.path.join(dataset_path, name))
        if img is None:
            continue
        stem = os.path.splitext(name)[0]
        pixels = img.shape[0] * img.shape[1]
        if mode in ("rans", "auto"):
            blob = compress_image(codec, params, img, tables, password=password)
            out_path = os.path.join(output_dir, stem + ".nic")
            with open(out_path, "wb") as f:
                f.write(blob)
            num_bytes = len(blob)
        elif mode == "png":
            sym = np.asarray(codec.encode(params, img[None]))
            packed = np.asarray(pack_planes(jnp.asarray(sym)))[0]
            num_bytes = save_png(packed, os.path.join(output_dir, stem + ".png"))
        else:
            raise ValueError(f"unknown bitstream mode {mode!r}")
        results.append(FileResult(stem, num_bytes, 8.0 * num_bytes / pixels))
    with open(os.path.join(output_dir, "val_bpp.txt"), "w") as f:
        for r in results:
            f.write(f"{r.name}\t{r.bpp}\n")
    return results


def decompress_directory(
    codec,
    params,
    compressed_path: str,
    output_dir: str | None = None,
    orig_shapes: dict[str, tuple[int, int]] | None = None,
    tables=None,
    password: str | None = None,
) -> list[str]:
    """Decompress every bitstream file to ``<stem>.png`` reconstructions.

    PNG-parity mode has no header, so original H,W must come from
    ``orig_shapes`` (stem -> (H, W)); the reference sidesteps this because its
    packed shape implies the padded size (tf2_0/src/utils.py:35-36)."""
    mode = codec.cfg.codec.bitstream
    if output_dir is None:
        output_dir = compressed_path.replace("compressed", "uncompressed")
    os.makedirs(output_dir, exist_ok=True)
    if mode in ("rans", "auto") and tables is None:
        tables = build_tables(codec, params)
    written = []
    for name in sorted(os.listdir(compressed_path)):
        stem, ext = os.path.splitext(name)
        path = os.path.join(compressed_path, name)
        if mode in ("rans", "auto") and ext == ".nic":
            with open(path, "rb") as f:
                rgb = decompress_image(
                    codec, params, f.read(), tables, password=password
                )
        elif mode == "png" and ext == ".png":
            packed = load_image(path)
            if packed is None:
                continue
            sym = np.asarray(unpack_planes(jnp.asarray(packed[None])))
            ds = codec.downsample
            out_hw = None
            if orig_shapes and stem in orig_shapes:
                out_hw = orig_shapes[stem]
            rgb = np.asarray(codec.decode(params, sym, out_hw=out_hw))[0]
        else:
            continue
        out_path = os.path.join(output_dir, stem + ".png")
        save_png(rgb, out_path, optimize=False)
        written.append(out_path)
    return written


def evaluate_directories(dir_a: str, dir_b: str) -> dict:
    """PSNR + MS-SSIM between same-stem files of two directories
    (the reference's calc_ssim comparator, tf1_13/tests/calc_ssim.py:26-34)."""
    stems_a = {os.path.splitext(n)[0]: n for n in list_images(dir_a)}
    stems_b = {os.path.splitext(n)[0]: n for n in list_images(dir_b)}
    per_file = {}
    for stem in sorted(stems_a.keys() & stems_b.keys()):
        a = load_image(os.path.join(dir_a, stems_a[stem]))
        b = load_image(os.path.join(dir_b, stems_b[stem]))
        if a is None or b is None or a.shape != b.shape:
            continue
        aj = jnp.asarray(a[None], jnp.float32)
        bj = jnp.asarray(b[None], jnp.float32)
        per_file[stem] = {
            "psnr": float(psnr(aj, bj, max_val=255.0)[0]),
            "ms_ssim": float(ms_ssim(aj, bj, max_val=255.0)[0]),
        }
    n = max(len(per_file), 1)
    return {
        "per_file": per_file,
        "mean_psnr": sum(v["psnr"] for v in per_file.values()) / n,
        "mean_ms_ssim": sum(v["ms_ssim"] for v in per_file.values()) / n,
    }


def rd_point(codec, params, val_dir: str, tables=None) -> dict:
    """In-memory rate-distortion point over a directory: mean bpp (actual
    bitstream bytes), PSNR, MS-SSIM."""
    mode = codec.cfg.codec.bitstream
    if mode in ("rans", "auto") and tables is None:
        tables = build_tables(codec, params)
    rows = []
    for name in list_images(val_dir):
        img = load_image(os.path.join(val_dir, name))
        if img is None:
            continue
        pixels = img.shape[0] * img.shape[1]
        if mode in ("rans", "auto"):
            blob = compress_image(codec, params, img, tables)
            num_bytes = len(blob)
            recon = decompress_image(codec, params, blob, tables)
        else:
            sym = np.asarray(codec.encode(params, img[None]))
            packed = np.asarray(pack_planes(jnp.asarray(sym)))[0]
            num_bytes = png_num_bytes(packed)
            recon = np.asarray(
                codec.decode(params, sym, out_hw=img.shape[:2])
            )[0]
        aj = jnp.asarray(img[None], jnp.float32)
        bj = jnp.asarray(recon[None], jnp.float32)
        rows.append(
            FileResult(
                os.path.splitext(name)[0],
                num_bytes,
                8.0 * num_bytes / pixels,
                float(psnr(aj, bj, max_val=255.0)[0]),
                float(ms_ssim(aj, bj, max_val=255.0)[0]),
            )
        )
    n = max(len(rows), 1)
    return {
        "files": rows,
        "mean_bpp": sum(r.bpp for r in rows) / n,
        "mean_psnr": sum(r.psnr for r in rows) / n,
        "mean_ms_ssim": sum(r.ms_ssim for r in rows) / n,
    }

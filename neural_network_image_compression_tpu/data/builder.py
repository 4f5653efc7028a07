"""Training-patch dataset builder.

Capability parity with the reference's ``imagenet_download.ipynb`` (cells
0-9): take candidate images, center-crop to square, keep only sufficiently
textured ones (``std > 20``), resize to the patch size, and save numbered
JPEGs, with a worker pool for throughput. The reference crawls ImageNet
fall11 URLs; this builder works from a local source directory (the
deployment environment has no egress) — point it at any image corpus.
"""
from __future__ import annotations

import os
from multiprocessing import Pool

import numpy as np
from PIL import Image

from neural_network_image_compression_tpu.data.io import IMAGE_EXTENSIONS


def _process_one(args: tuple[str, str, int, float]) -> bool:
    src_path, dst_path, patch_size, min_std = args
    try:
        with Image.open(src_path) as im:
            im = im.convert("RGB")
            w, h = im.size
            side = min(w, h)
            left = (w - side) // 2
            top = (h - side) // 2
            im = im.crop((left, top, left + side, top + side))
            arr = np.asarray(im)
            if arr.std() <= min_std:  # reject flat patches (notebook cell 6)
                return False
            im = im.resize((patch_size, patch_size), Image.LANCZOS)
            im.save(dst_path, "JPEG", quality=95)
        return True
    except Exception:
        return False  # the notebook swallows download/decode errors (cell 7)


def build_patches(
    source_dir: str,
    output_dir: str,
    patch_size: int = 128,
    min_std: float = 20.0,
    limit: int | None = None,
    seed: int = 0,
    workers: int = 12,  # notebook uses Pool(12) (cell 8)
) -> int:
    """Build a numbered patch set from a local image directory.
    Returns the number of patches written."""
    os.makedirs(output_dir, exist_ok=True)
    names = [
        f for f in sorted(os.listdir(source_dir))
        if f.lower().endswith(IMAGE_EXTENSIONS)
    ]
    rng = np.random.default_rng(seed)
    rng.shuffle(names)  # the notebook shuffles its URL list (cell 3)
    if limit is not None:
        names = names[: limit * 2]  # headroom for rejects
    tasks = []
    idx = 0
    for name in names:
        tasks.append(
            (
                os.path.join(source_dir, name),
                os.path.join(output_dir, f"{idx:05d}.jpg"),
                patch_size,
                min_std,
            )
        )
        idx += 1
    if workers > 1:
        with Pool(workers) as pool:
            results = pool.map(_process_one, tasks)
    else:
        results = [_process_one(t) for t in tasks]
    written = 0
    # Renumber compactly (rejected slots leave gaps otherwise).
    for (src, dst, *_), ok in zip(tasks, results):
        if ok:
            final = os.path.join(output_dir, f"{written:05d}.jpg")
            if dst != final:
                os.replace(dst, final)
            written += 1
            if limit is not None and written >= limit:
                break
    # Drop leftovers beyond the limit.
    for name in os.listdir(output_dir):
        stem = os.path.splitext(name)[0]
        if stem.isdigit() and int(stem) >= written:
            os.remove(os.path.join(output_dir, name))
    return written

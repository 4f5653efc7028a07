"""Training-patch dataset builder.

Capability parity with the reference's ``imagenet_download.ipynb`` (cells
0-9): take candidate images, center-crop to square, keep only sufficiently
textured ones (``std > 20``), resize to the patch size, and save numbered
JPEGs, with a worker pool for throughput. Two source modes:

- :func:`build_patches` — a local source directory (any image corpus).
- :func:`build_patches_from_urls` — a URL-list file with the reference's
  crawl semantics (notebook cells 3, 7-8: shuffle the list, ``Pool(12)``
  parallel fetch, swallow every per-item error). The reference feeds it
  the ImageNet fall11_urls file (``<id>\\t<url>`` lines); ``file://`` URLs
  work too, which is how the egress-less CI exercises it.
"""
from __future__ import annotations

import os
from multiprocessing import Pool

import numpy as np
from PIL import Image

from neural_network_image_compression_tpu.data.io import IMAGE_EXTENSIONS


def _crop_filter_save(im: Image.Image, dst_path: str, patch_size: int,
                      min_std: float) -> bool:
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


def _process_one(args: tuple[str, str, int, float]) -> bool:
    src_path, dst_path, patch_size, min_std = args
    try:
        with Image.open(src_path) as im:
            return _crop_filter_save(im, dst_path, patch_size, min_std)
    except Exception:
        return False  # the notebook swallows download/decode errors (cell 7)


def _fetch_one(args: tuple[str, str, int, float, float]) -> bool:
    """Fetch a URL and run the crop/filter/save pipeline on it — the
    reference's ``save_patch`` worker (notebook cells 7-8), errors swallowed
    the same way. Supports any urllib scheme incl. ``file://``."""
    url, dst_path, patch_size, min_std, timeout = args
    import io
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            data = r.read()
        with Image.open(io.BytesIO(data)) as im:
            return _crop_filter_save(im, dst_path, patch_size, min_std)
    except Exception:
        return False


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
    results = _run_pool(_process_one, tasks, workers)
    return _renumber(tasks, results, output_dir, limit)


def _run_pool(fn, tasks, workers: int):
    if workers > 1:
        with Pool(workers) as pool:
            return pool.map(fn, tasks)
    return [fn(t) for t in tasks]


def _renumber(tasks, results, output_dir: str, limit: int | None) -> int:
    """Compact the accepted outputs into a gapless 00000.jpg... numbering
    (rejected slots leave gaps otherwise) and drop leftovers past ``limit``.
    Returns the number of patches kept."""
    written = 0
    for (_src, dst, *_), ok in zip(tasks, results):
        if ok:
            final = os.path.join(output_dir, f"{written:05d}.jpg")
            if dst != final:
                os.replace(dst, final)
            written += 1
            if limit is not None and written >= limit:
                break
    for name in os.listdir(output_dir):
        stem = os.path.splitext(name)[0]
        if stem.isdigit() and int(stem) >= written:
            os.remove(os.path.join(output_dir, name))
    return written


def build_patches_from_urls(
    url_list_path: str,
    output_dir: str,
    patch_size: int = 128,
    min_std: float = 20.0,
    limit: int | None = None,
    seed: int = 0,
    workers: int = 12,  # notebook uses Pool(12) (cell 8)
    timeout: float = 10.0,
) -> int:
    """Build a numbered patch set by crawling a URL list — the reference's
    ImageNet download path (imagenet_download.ipynb cells 3, 7-8).

    ``url_list_path`` lines are either ``<id>\\t<url>`` (the fall11_urls
    format the reference consumes) or a bare URL. The list is shuffled
    (cell 3), fetched by a worker pool (cell 8), each image center-cropped
    square, rejected if ``std <= min_std``, resized, and saved as numbered
    JPEGs; every per-item failure (dead URL, bad image) is silently skipped
    exactly like the notebook (cell 7). Returns the number written."""
    os.makedirs(output_dir, exist_ok=True)
    urls = []
    with open(url_list_path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            urls.append(parts[1] if len(parts) > 1 else parts[0])
    rng = np.random.default_rng(seed)
    rng.shuffle(urls)
    if limit is not None:
        urls = urls[: limit * 2]  # headroom for rejects/dead links
    tasks = [
        (
            url,
            os.path.join(output_dir, f"{i:05d}.jpg"),
            patch_size,
            min_std,
            timeout,
        )
        for i, url in enumerate(urls)
    ]
    results = _run_pool(_fetch_one, tasks, workers)
    return _renumber(tasks, results, output_dir, limit)

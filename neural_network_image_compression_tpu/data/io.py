"""Image directory IO.

Capability parity with the reference's ``read_dataset``/``save_img``
(reference tf2_0/src/utils.py:85-120): same accepted extensions, grayscale
images skipped, sorted filename order, optimized-PNG writer (which doubles as
the reference-parity bitstream writer), and ragged (mixed-size) directory
support. All IO is host-side (PIL); arrays are NHWC uint8.
"""
from __future__ import annotations

import os
from typing import Iterator, Sequence

import numpy as np
from PIL import Image

# Reference accepted extensions: tf2_0/src/utils.py:94.
IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".gif", ".pgm", ".ppm", ".bmp", ".jp2")


def list_images(directory: str) -> list[str]:
    """Sorted image filenames (with extension) in a directory."""
    return sorted(
        f
        for f in os.listdir(directory)
        if f.lower().endswith(IMAGE_EXTENSIONS)
    )


def load_image(path: str) -> np.ndarray | None:
    """Load one image as uint8 [H,W,C]; None if grayscale/unreadable
    (the reference keeps only ``len(shape)==3`` images, tf2_0/src/utils.py:97-99)."""
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim != 3:
        return None
    return arr[..., :3]  # drop alpha if present


def read_dataset(
    directory: str,
) -> tuple[np.ndarray | list[np.ndarray], list[str]]:
    """Load a whole directory.

    Returns (images, stems). If every image has the same shape the images come
    back as one stacked uint8 [N,H,W,C] array; otherwise as a list of
    [H,W,C] arrays (the reference's ragged object-array path,
    tf2_0/src/utils.py:104-111). ``stems`` are filenames without extension.
    """
    names = list_images(directory)
    images, stems = [], []
    for name in names:
        arr = load_image(os.path.join(directory, name))
        if arr is None:
            continue
        images.append(arr)
        stems.append(os.path.splitext(name)[0])
    if not images:
        return np.zeros((0, 0, 0, 3), np.uint8), []
    shapes = {im.shape for im in images}
    if len(shapes) == 1:
        return np.stack(images), stems
    return images, stems


def save_png(img: np.ndarray, path: str, optimize: bool = True) -> int:
    """Write uint8 [H,W,C] or [H,W] as PNG; returns the file size in bytes.

    ``optimize=True`` matches the reference's bitstream writer
    (tf2_0/src/utils.py:87) — for PNG-parity mode the DEFLATE-optimized file
    IS the compressed representation.
    """
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        if not np.all(arr == arr.astype(np.uint8)):
            raise ValueError("save_png requires integer-valued input")
        arr = arr.astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path, format="PNG", optimize=optimize)
    return os.path.getsize(path)


def png_num_bytes(img: np.ndarray, optimize: bool = True) -> int:
    """Size in bytes of the optimized-PNG encoding, without touching disk.

    This is the reference's rate proxy (tf2_0/src/training.py:12-21 uses
    in-graph ``tf.image.encode_png``; we only need it host-side for the
    parity/eval path)."""
    import io

    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, format="PNG", optimize=optimize)
    return buf.getbuffer().nbytes


def iter_batches(
    images: np.ndarray | Sequence[np.ndarray],
    stems: Sequence[str],
    batch_size: int,
) -> Iterator[tuple[np.ndarray, list[str]]]:
    """Batched iteration; ragged datasets fall back to batch size 1
    (reference tf2_0/src/utils.py:53-62)."""
    if isinstance(images, np.ndarray):
        for i in range(0, len(images), batch_size):
            yield images[i : i + batch_size], list(stems[i : i + batch_size])
    else:
        for im, stem in zip(images, stems):
            yield im[None], [stem]

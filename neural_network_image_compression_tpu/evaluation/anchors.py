"""Classical codec anchors for R-D comparison.

BASELINE.md: "JPEG/PNG at matched bpp as classical anchors". Produces
(bpp, PSNR, MS-SSIM) points for JPEG at a sweep of quality factors and the
PNG lossless rate, over an image directory.
"""
from __future__ import annotations

import io
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from neural_network_image_compression_tpu.data.io import list_images, load_image
from neural_network_image_compression_tpu.ops import ms_ssim, psnr


def jpeg_rd_curve(
    directory: str, qualities: tuple = (10, 25, 50, 75, 90)
) -> list[dict]:
    """JPEG anchor points averaged over the directory, one per quality."""
    images = [
        load_image(os.path.join(directory, n)) for n in list_images(directory)
    ]
    images = [im for im in images if im is not None]
    points = []
    for q in qualities:
        bpps, psnrs, msss = [], [], []
        for im in images:
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, "JPEG", quality=q)
            data = buf.getbuffer().nbytes
            with Image.open(io.BytesIO(buf.getvalue())) as dec:
                rec = np.asarray(dec.convert("RGB"))
            bpps.append(8.0 * data / (im.shape[0] * im.shape[1]))
            a = jnp.asarray(im[None], jnp.float32)
            b = jnp.asarray(rec[None], jnp.float32)
            psnrs.append(float(psnr(a, b, max_val=255.0)[0]))
            msss.append(float(ms_ssim(a, b, max_val=255.0)[0]))
        points.append(
            {
                "codec": "jpeg",
                "quality": q,
                "bpp": float(np.mean(bpps)),
                "psnr": float(np.mean(psnrs)),
                "ms_ssim": float(np.mean(msss)),
            }
        )
    return points


def png_rate(directory: str) -> dict:
    """Lossless PNG anchor: mean optimized-PNG bpp over the directory."""
    bpps = []
    for n in list_images(directory):
        im = load_image(os.path.join(directory, n))
        if im is None:
            continue
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, "PNG", optimize=True)
        bpps.append(8.0 * buf.getbuffer().nbytes / (im.shape[0] * im.shape[1]))
    return {"codec": "png", "bpp": float(np.mean(bpps)), "psnr": float("inf")}

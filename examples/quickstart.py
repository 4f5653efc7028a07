"""Minimal end-to-end tour of the framework's Python API.

Covers what a reference user does with ProClass/Encoder/Decoder (reference
tf2_0/src/encoder.py:49-51, decoder.py:50-52) plus the capabilities the
reference lacks: a real entropy-coded container, encryption, and R-D
metrics. Runs on CPU in ~a minute (set nothing and it uses whatever JAX
backend is available; first TPU compile takes ~30 s).

    python examples/quickstart.py [image.png] [run_dir]

With a run_dir (e.g. a `runs_r3/gdn_l001` checkpoint directory) you get the
trained flagship; without one, freshly-initialized parameters — the point is
the pipeline, not the quality.

Training the flagship from scratch (one TPU chip, ~15 min):

    python -m neural_network_image_compression_tpu train --tpu-native \
        --data /root/reference/data/imagenet_patches \
        --val /root/reference/data/kodak_img \
        --run-dir runs/my_flagship --epochs 30 --batch-size 64 \
        --rd-lambda 0.01 --rd-lambda-step 0
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from neural_network_image_compression_tpu.coding.codec_stream import (
    compress_image,
    decompress_image,
)
from neural_network_image_compression_tpu.config import tpu_native
from neural_network_image_compression_tpu.data import load_image
from neural_network_image_compression_tpu.models import NeuralCodec
from neural_network_image_compression_tpu.ops import ms_ssim, psnr

image_path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/data/kodak_img/kodim21.png"
)
run_dir = sys.argv[2] if len(sys.argv) > 2 else None

if run_dir:
    from neural_network_image_compression_tpu.cli import _load_run

    codec, params = _load_run(run_dir)
else:
    codec = NeuralCodec(tpu_native())
    params = codec.init(jax.random.key(0), (128, 128))

img = load_image(image_path)
h, w = img.shape[:2]

# --- compress to a real container (rANS streams + header + CRC) -----------
blob = compress_image(codec, params, img)
bpp = 8 * len(blob) / (h * w)
print(f"{image_path}: {len(blob)} bytes = {bpp:.3f} bpp")

# --- decompress and score -------------------------------------------------
recon = decompress_image(codec, params, blob)
a = img[None].astype(np.float32)
b = recon[None].astype(np.float32)
print(
    f"PSNR {float(psnr(a, b, max_val=255.0)[0]):.2f} dB, "
    f"MS-SSIM {float(ms_ssim(a / 255.0, b / 255.0)[0]):.4f}"
)

# --- encrypted container (the reference README's claimed-but-missing
#     capability): ChaCha20 + HMAC envelope, wrong key fails loudly --------
secret = compress_image(codec, params, img, password="correct horse")
try:
    decompress_image(codec, params, secret, password="wrong")
except ValueError as e:
    print(f"wrong password rejected: {e}")
ok = decompress_image(codec, params, secret, password="correct horse")
assert (ok == recon).all()
print("encrypted round-trip matches plain container")

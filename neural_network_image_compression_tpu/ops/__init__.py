from neural_network_image_compression_tpu.ops.colorspace import (
    YCBCR,
    PCA,
    Colorspace,
    get_colorspace,
    rgb_to_planes,
    planes_to_rgb,
)
from neural_network_image_compression_tpu.ops.pack import (
    pack_latent,
    unpack_latent,
    pack_planes,
    unpack_planes,
)
from neural_network_image_compression_tpu.ops.quantize import (
    quantize,
    dequantize,
    noise_surrogate,
    ste_round,
)
from neural_network_image_compression_tpu.ops.metrics import psnr, ssim, ms_ssim

from neural_network_image_compression_tpu.coding.cdf import estimate_bits, quantize_pmf
from neural_network_image_compression_tpu.coding.codec_stream import (
    build_tables,
    compress_image,
    decode_latent,
    decompress_image,
    decompress_symbols,
    encode_latent,
)
from neural_network_image_compression_tpu.coding.onchip import (
    compress_batch,
    decompress_batch,
)
from neural_network_image_compression_tpu.coding.container import (
    ContainerHeader,
    pack_container,
    unpack_container,
)
from neural_network_image_compression_tpu.coding import rans

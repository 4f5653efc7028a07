from neural_network_image_compression_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
)
from neural_network_image_compression_tpu.parallel.spatial import (
    tiled_decode,
    tiled_decode_2d,
    tiled_encode,
    tiled_encode_2d,
    compress_image_tiled,
    decompress_image_tiled,
)
from neural_network_image_compression_tpu.parallel.launch import (
    global_mesh,
    initialize_distributed,
    process_info,
)

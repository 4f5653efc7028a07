from neural_network_image_compression_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from neural_network_image_compression_tpu.parallel.spatial import (
    tiled_decode,
    tiled_encode,
    compress_image_tiled,
    decompress_image_tiled,
)
from neural_network_image_compression_tpu.parallel.launch import (
    global_mesh,
    initialize_distributed,
    process_info,
)

from neural_network_image_compression_tpu.evaluation.pipelines import (
    compress_directory,
    decompress_directory,
    evaluate_directories,
    rd_point,
    rd_point_batched,
)

from neural_network_image_compression_tpu.utils.diagnostics import (
    discrete_entropy,
    latent_visualization,
    side_by_side,
)
from neural_network_image_compression_tpu.utils.runs import next_run_dir
from neural_network_image_compression_tpu.utils.profiling import profile_trace

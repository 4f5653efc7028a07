from neural_network_image_compression_tpu.data.io import (
    list_images,
    load_image,
    read_dataset,
    save_png,
)
from neural_network_image_compression_tpu.data.pipeline import PatchDataset

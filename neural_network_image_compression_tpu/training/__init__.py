from neural_network_image_compression_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_train_step,
)
from neural_network_image_compression_tpu.training.trainer import Trainer
from neural_network_image_compression_tpu.training.checkpoint import (
    CheckpointStore,
)

from neural_network_image_compression_tpu.models.autoencoder import (
    AnalysisTransform,
    SynthesisTransform,
    make_transforms,
)
from neural_network_image_compression_tpu.models.entropy import (
    EntropyRegressor,
    FactorizedEntropyModel,
)
from neural_network_image_compression_tpu.models.codec import NeuralCodec

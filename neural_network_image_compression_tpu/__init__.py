"""TPU-native learned image compression framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
AlexFuster/Neural_network_image_compression (a TF1/TF2 conv-autoencoder lossy
image codec): analysis/synthesis conv transforms over YCbCr planes, uniform
latent quantization, learned entropy models driving a real range (rANS) coder,
rate-distortion training, and distributed (data-parallel + spatially tiled)
execution over a TPU device mesh.

Layout
------
- ``config``     typed configuration (replaces the reference's argv/hardcoded
                 hyperparameters, see reference tf1_13/tests/test_training.py:7-12)
- ``ops``        colorspace, metrics (PSNR/SSIM/MS-SSIM), quantization,
                 latent packing, Pallas kernels
- ``models``     flax.linen analysis/synthesis transforms, entropy models
- ``coding``     learned-CDF -> fixed-point tables -> rANS bitstream + container
- ``data``       image directory IO and the training input pipeline
- ``training``   rate-distortion training loop, checkpointing
- ``evaluation`` file-level compress/decompress pipelines, R-D evaluation tools
- ``parallel``   device mesh helpers, data-parallel training, spatial tiling
                 with halo exchange
"""

__version__ = "0.1.0"

"""Typed configuration for the whole framework.

The reference has no config system: hyperparameters are hardcoded or passed as
positional ``sys.argv`` (reference tf1_13/tests/test_training.py:7-12,
tf2_0/src/training.py:175-179). Here every knob lives in one serializable tree
of frozen dataclasses so runs are reproducible and shardable.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(x) for x in obj]
    return obj


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the neural codec.

    ``preset='base'`` is the reference tf2_0 topology (8x downsample, 32-ch
    latent, leaky_relu; reference tf2_0/src/encoder.py:7-32, decoder.py:7-32).
    ``preset='deep'`` is the reference tf1_13 topology (16x downsample, PReLU,
    two residual stages; reference tf1_13/src/utils.py:39-79).
    """

    preset: str = "base"                 # 'base' | 'deep'
    latent_channels: int = 32            # per colour plane
    leaky_relu_slope: float = 0.2        # TF default alpha (tf.nn.leaky_relu)
    prelu_init: float = 0.2              # reference tf1_13/src/utils.py:20-21
    # 'preset_default' = the reference activation of the chosen preset
    # (leaky_relu for base/tf2_0, PReLU for deep/tf1_13); 'gdn' swaps the
    # inter-stage activations for (I)GDN divisive normalization
    # (models/layers.py GDN) — beyond-reference R-D upgrade.
    activation: str = "preset_default"   # 'preset_default' | 'leaky_relu'
                                         # | 'prelu' | 'gdn'
    gdn_dtype: str = "float32"           # 'float32' | 'compute' — GDN norm
                                         # evaluation dtype (serving perf
                                         # lever for bf16 pipelines)
    clip_latent: bool = True             # clip latent to [0,1] before quantize
    compute_dtype: str = "float32"       # 'float32' | 'bfloat16' for conv compute
    backend: str = "xla"                 # 'xla' | 'pallas' | 'auto' (inference
                                         # conv engine; 'auto' = XLA analysis +
                                         # pallas synthesis, fastest on v5e)
    convt: str = "xla"                   # 'xla' | 'subpixel' — stride-2
                                         # transposed-conv engine. 'subpixel'
                                         # runs the mathematically identical
                                         # phase-decomposed conv at low res +
                                         # depth-to-space (checkpoint drop-in;
                                         # layers.SubpixelConvTranspose).
                                         # Measured on v5e: SLOWER (decode 161
                                         # vs 103 ms at batch 128) — the TPU
                                         # conv unit eats input dilation
                                         # natively and the phase interleave
                                         # costs unfused HBM shuffles
                                         # (RESULTS.md §8.9), so 'xla' is the
                                         # default.

    @property
    def downsample(self) -> int:
        return 16 if self.preset == "deep" else 8


@dataclass(frozen=True)
class EntropyConfig:
    """Rate model.

    ``kind='factorized'`` (default): Ballé-style fully factorized learned
    density per latent channel; differentiable bits, and its CDF drives the
    rANS coder (the reference's PNG/DEFLATE stand-in replaced by a real
    entropy coder).
    ``kind='regressor'``: the reference-faithful Entropynet CNN that regresses
    a scalar bpp (reference tf2_0/src/training.py:25-42).
    """

    kind: str = "factorized"             # 'factorized' | 'regressor'
    filters: tuple = (3, 3, 3)           # hidden widths of the factorized chain
    regressor_target: str = "factorized" # 'factorized' | 'png' (parity mode)
    tail_mass: float = 1e-9              # probability floor for coding tables
    cdf_precision: int = 16              # fixed-point bits of the rANS tables
    # Conditional rate model on top of the factorized density (factorized
    # kind only). 'checkerboard': anchors coded factorized, the other half
    # conditionally (Gaussian mean/scale from a conv over the anchors) — two
    # parallel passes, no autoregressive scan. 'hyperprior': a transmitted
    # side latent z (models/hyperprior.py) decodes into a dense per-position
    # Gaussian for EVERY main-latent element (mean-scale hyperprior,
    # Ballé/Minnen 2018) — one pass, z costs ~1-3% of the rate. 'joint':
    # hyperprior + checkerboard combined (Minnen/He-style joint context):
    # anchors coded with the hyper Gaussian (replacing the checkerboard
    # mode's static factorized tables), non-anchors with a context net over
    # [decoded anchors ++ raw hyper features] — strictly more information
    # than either model alone.
    # 'channel': CHARM-style channel-wise autoregression (models/entropy.py
    # ChannelContext) — slice 0 factorized, later channel slices coded with a
    # Gaussian predicted from the already-coded slices. No transmitted side
    # info and no hyper net (whose patch-fit conditionals lose on Kodak —
    # RESULTS.md r2/r3 findings); decode is `channel_slices` dense conv
    # passes, all spatially parallel.
    context: str = "none"    # 'none' | 'checkerboard' | 'hyperprior'
                             # | 'joint' | 'channel'
    context_hidden: int = 96             # conv width of the context/hyper nets
    channel_slices: int = 4              # channel-context slice count
                                         # (latent_channels must divide by it)
    hyper_channels: int = 16             # hyper latent channels (z)
    scale_bins: int = 64                 # conditional-Gaussian CDF rows
    scale_min: float = 0.11              # sigma range (symbol units)
    scale_max: float = 256.0
    # Per-image adaptive CDF tables (coding/adaptive.py): the encoder
    # histograms the actual symbols and embeds exact tables in the container
    # (~10 B/channel) — the learned codec's dynamic-Huffman. Applies to the
    # factorized streams (whole plane, or anchors under the checkerboard);
    # not used with the hyperprior (its conditional already adapts).
    adaptive_tables: bool = False


@dataclass(frozen=True)
class QuantizerConfig:
    levels: int = 256                    # number of quantization levels/symbols
    surrogate: str = "noise"             # 'noise' (reference) | 'ste' | 'noise+ste'
    noise_to_rate_model: bool = True     # reference feeds the CLEAN latent to the
                                         # rate model (tf2_0/src/training.py:90);
                                         # True fixes that quirk (default).
    # 'unit': latent clipped to [0,1], quantized to `levels` steps (the
    # reference's scheme, tf2_0/src/encoder.py:47). 'integer': UNBOUNDED
    # latent in symbol units, quantize = round(y) + levels//2 (Ballé-style;
    # requires model.clip_latent=False). The integer grid is what makes the
    # R-D λ control the rate — see ops/quantize.py.
    grid: str = "unit"                   # 'unit' | 'integer'


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64                 # reference tf2_0/src/training.py:179
    max_epochs: int = 30
    learning_rate: float = 1e-4          # reference tf2_0/src/training.py:56-58
    grad_clip_norm: float | None = None  # optax.clip_by_global_norm before
                                         # Adam; stabilizer for GDN+STE runs
                                         # (RESULTS.md r4)
    gdn_lr_scale: float | None = None    # lr multiplier for GDN beta/gamma
                                         # params only (separate Adam group);
                                         # the targeted stabilizer for the
                                         # GDN+STE divergence (RESULTS.md
                                         # §8.3: STE's unsmoothed identity
                                         # gradient amplifies the IGDN
                                         # multiplicative path)
    ste_warmup_steps: int = 0            # with surrogate='noise+ste': train
                                         # the first N steps with the noise
                                         # surrogate, then switch to STE —
                                         # lets the GDN scales settle before
                                         # the raw rounding gradient arrives
    rd_lambda: float = 0.01              # initial rate weight (entropy_loss_coef)
    rd_lambda_step: float = 0.01         # += per epoch (tf2_0/src/training.py:165)
    chroma_lambda: float | None = None   # None => same as rd_lambda. The
                                         # reference hardcodes 0.01 for chroma
                                         # (tf2_0/src/training.py:119); set it
                                         # explicitly for faithful mode.
    distortion: str = "ssim"             # 'ssim' | 'ms_ssim' | 'mse'
    mosaic: int = 1                      # G>1: train on GxG patch mosaics
                                         # ((G*128)^2 crops) — the larger-crop
                                         # lever for hyper-side context
                                         # generalization (RESULTS.md §7.2)
    augment_flips: bool = True           # random H/V flips (training.py:77-78)
    val_every_steps: int = 100           # reference validates every 10 steps
    checkpoint_every_steps: int = 500
    seed: int = 0
    log_every_steps: int = 50
    shuffle_buffer: int = 10000
    # Quality-gated checkpointing (reference tf1_13/src/training.py:213-215:
    # refuse to persist a degenerate model). None disables a gate.
    gate_max_entropy: float | None = None    # bits/symbol of rounded latent
    gate_min_ms_ssim: float | None = None    # validation MS-SSIM floor
    profile_dir: str | None = None           # jax.profiler trace output
    tensorboard: bool = True                 # event files under <run>/tb
                                             # (reference tf1_13/src/
                                             # training.py:163-164)
    val_artifacts: bool = True               # dump side-by-side + latent viz
    freeze_transforms: bool = False          # train only the rate side (entropy
                                             # + context nets); use with a
                                             # warm start to re-fit the coder
                                             # to an existing codec


@dataclass(frozen=True)
class DataConfig:
    train_dir: str = "/root/reference/data/imagenet_patches"
    val_dir: str = "/root/reference/data/kodak_img"
    patch_size: int = 128
    prefetch: int = 2


@dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh. data-parallel x spatial-tile axes."""

    data: int = 1
    spatial: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.spatial


@dataclass(frozen=True)
class CodecConfig:
    """End-to-end codec settings (compression pipelines)."""

    colorspace: str = "ycbcr"            # 'ycbcr' | 'pca'
    bitstream: str = "rans"              # 'rans' | 'png' (reference parity mode)
                                         # | 'auto' (per-image best of rANS
                                         # and packed-latent PNG — rate <=
                                         # the reference coder by construction)
    tile_size: int = 0                   # 0 = whole image; else spatial tile edge
    model_id: str = "base-ycbcr-32"
    coder: str = "rans64"                # entropy-coder byte format:
                                         # 'rans64' (64-bit state, 4-way
                                         # interleaved — ~3x decode) |
                                         # 'rans32' (legacy v1 streams).
                                         # Decode is self-describing either
                                         # way (container flag bit4).
    deterministic: bool = False          # context/hyper conditional params via
                                         # fixed-point integer inference
                                         # (coding/detnet.py): containers
                                         # decode bit-exactly on ANY platform
                                         # at a fraction-of-a-percent rate
                                         # cost. Decode autodetects (flag
                                         # bit5); this picks the encode side.


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    entropy: EntropyConfig = field(default_factory=EntropyConfig)
    quantizer: QuantizerConfig = field(default_factory=QuantizerConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    codec: CodecConfig = field(default_factory=CodecConfig)

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        return cls(
            model=ModelConfig(**_tupled(d.get("model", {}))),
            entropy=EntropyConfig(**_tupled(d.get("entropy", {}))),
            quantizer=QuantizerConfig(**_tupled(d.get("quantizer", {}))),
            train=TrainConfig(**_tupled(d.get("train", {}))),
            data=DataConfig(**_tupled(d.get("data", {}))),
            mesh=MeshConfig(**_tupled(d.get("mesh", {}))),
            codec=CodecConfig(**_tupled(d.get("codec", {}))),
        )

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)


def _tupled(d: dict) -> dict:
    return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}


# Reference-faithful preset: reproduces the tf2_0 training semantics
# (clean latent into the rate model, hardcoded chroma lambda, Entropynet
# regressor with a PNG bpp target) for parity experiments.
def reference_faithful() -> Config:
    return Config(
        entropy=EntropyConfig(kind="regressor", regressor_target="png"),
        quantizer=QuantizerConfig(surrogate="noise", noise_to_rate_model=False),
        train=TrainConfig(chroma_lambda=0.01, val_every_steps=10),
        codec=CodecConfig(bitstream="png"),
    )


# TPU-native flagship preset: unbounded latent on the integer symbol grid
# (λ controls rate), checkerboard spatial context over the factorized density
# driving the rANS coder, bfloat16 conv compute. This is the configuration
# whose learned bitstream is meant to beat the reference's packed-latent
# optimized-PNG coder (reference tf2_0/src/utils.py:85-87) on its own latents.
def tpu_native(rd_lambda: float = 0.01) -> Config:
    return Config(
        model=ModelConfig(clip_latent=False, compute_dtype="bfloat16"),
        entropy=EntropyConfig(context="checkerboard", adaptive_tables=True),
        quantizer=QuantizerConfig(grid="integer"),
        train=TrainConfig(rd_lambda=rd_lambda, rd_lambda_step=0.0),
        codec=CodecConfig(model_id="base-ycbcr-32-int"),
    )


# Measured context crossovers for the GDN flagship stack (base preset,
# 18.5k-patch split, 30 epochs; RESULTS.md §9.1 — the 4-point λ sweep
# {0.003, 0.01, 0.03, 0.1} on kodim21 AND the held-out mosaics):
#   - high rate (>= ~2.5 bpp, λ < 0.02): checkerboard leads (e.g. λ=0.003:
#     31.66 dB @ 3.60 bpp vs channel 31.12 @ 3.54)
#   - mid rate (~1.2-2.5 bpp, 0.02 <= λ < 0.07): channel (CHARM) leads —
#     the round-4 "channel never leads" row came from a run that hung at
#     epoch 27; trained to 30 epochs it wins +0.5-1.1 dB at equal rate on
#     kodim21 (e.g. 30.78 dB @ 2.13 bpp vs the checkerboard curve's ~30.1)
#     and ties/leads on the mosaics
#   - low rate (< ~1.2 bpp, λ >= 0.07): joint (hyper+checkerboard) dominates
#     outright (λ=0.1: 26.67 dB @ 0.87 bpp vs checkerboard 26.03 @ 1.15)
# Boundaries are the λ values of the measured RATE crossovers on this
# preset/dataset; retrain the sweep before trusting them on another corpus.
FLAGSHIP_CONTEXT_CROSSOVERS = ((0.07, "joint"), (0.02, "channel"))


def flagship_context(rd_lambda: float) -> str:
    for bound, ctx in FLAGSHIP_CONTEXT_CROSSOVERS:
        if rd_lambda >= bound:
            return ctx
    return "checkerboard"


# Flagship preset: tpu_native + GDN transforms — the measured best R-D stack,
# with the entropy context chosen by the target rate via the measured
# crossover table above. STE diverges with GDN (RESULTS.md §8.3), so the
# surrogate stays 'noise'. bench.py's default model.
def flagship(rd_lambda: float = 0.01) -> Config:
    cfg = tpu_native(rd_lambda)
    context = flagship_context(rd_lambda)
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, activation="gdn"
        ),
        entropy=dataclasses.replace(cfg.entropy, context=context),
        codec=dataclasses.replace(
            cfg.codec, model_id=f"base-gdn-ycbcr-32-int-{context}"
        ),
    )

"""Analysis (encoder) and synthesis (decoder) conv transforms.

Two presets, capability-matched to the two reference generations:

- ``base``: the tf2_0 topology (reference tf2_0/src/encoder.py:7-32,
  tf2_0/src/decoder.py:7-32). Analysis: 32@5x5/s2 -> 64@5x5/s2 -> residual
  pair (64@3x3/s1 x2, skip add) -> C@5x5/s2, leaky_relu(0.2) on every conv,
  output clipped to [0,1]. Synthesis mirrors it with transposed convs
  (the stride-1 residual convs are ConvTranspose in the reference too).
  8x spatial downsample, C=32 latent channels per colour plane.

- ``deep``: the tf1_13 topology (reference tf1_13/src/utils.py:39-79).
  Four stride-2 stages (16x downsample) with PReLU (per-channel alpha,
  init 0.2) and two residual stages; decoder residual stages use regular
  convs between transposed-conv upsamples.

TPU notes: NHWC layout; SAME padding on stride-2 convs defines the halo
widths used by spatial tiling (parallel/spatial.py). Convs run in
``compute_dtype`` (bfloat16 recommended on TPU) with float32 params; the
clip/quantize boundary is always evaluated in float32 so quantized symbols
do not flip between dtype modes.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from neural_network_image_compression_tpu.models.layers import (
    GDN,
    PReLU,
    SubpixelConvTranspose,
)


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class _TransformBase(nn.Module):
    preset: str = "base"
    latent_channels: int = 32
    leaky_relu_slope: float = 0.2
    prelu_init: float = 0.2
    clip_output: bool = True
    compute_dtype: str = "float32"
    # 'preset_default' = leaky_relu for 'base' (tf2_0), PReLU for 'deep'
    # (tf1_13); 'gdn' swaps every inter-stage activation for GDN (IGDN in the
    # synthesis transform) and leaves the FINAL stage of each transform linear
    # (the standard Balle placement: no nonlinearity on the latent itself or
    # on the image-domain output, which is clipped separately).
    activation: str = "preset_default"
    gdn_dtype: str = "float32"  # 'float32' | 'compute' (see layers.GDN)
    # Stride-2 transposed-conv engine: 'subpixel' computes the identical
    # result as one low-res conv + depth-to-space instead of XLA's
    # input-dilated conv over 75% structural zeros (layers.
    # SubpixelConvTranspose — parameter-compatible, so checkpoints are
    # drop-in); 'xla' keeps nn.ConvTranspose. On TPU v5e 'xla' measures
    # FASTER (the conv unit handles input dilation natively; RESULTS.md
    # §8.9), so it is the default; 'subpixel' is the right engine where
    # lhs-dilated convs lower poorly.
    convt: str = "xla"

    _GDN_INVERSE = False  # overridden by SynthesisTransform

    def _act(self, x: jnp.ndarray, name: str, final: bool = False) -> jnp.ndarray:
        kind = self.activation
        if kind == "preset_default":
            kind = "prelu" if self.preset == "deep" else "leaky_relu"
        if kind == "gdn":
            if final:
                return x
            return GDN(
                inverse=self._GDN_INVERSE, compute=self.gdn_dtype,
                name=name + "_gdn",
            )(x)
        if kind == "prelu":
            return PReLU(init=self.prelu_init, name=name)(x)
        if kind == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=self.leaky_relu_slope)
        raise ValueError(f"unknown activation {kind!r}")

    def _conv(self, features: int, kernel: int, stride: int, name: str):
        return nn.Conv(
            features,
            (kernel, kernel),
            strides=(stride, stride),
            padding="SAME",
            dtype=_dtype(self.compute_dtype),
            param_dtype=jnp.float32,
            name=name,
        )

    def _convT(self, features: int, kernel: int, stride: int, name: str):
        if stride == 2 and self.convt == "subpixel":
            return SubpixelConvTranspose(
                features,
                kernel,
                dtype=_dtype(self.compute_dtype),
                name=name,
            )
        return nn.ConvTranspose(
            features,
            (kernel, kernel),
            strides=(stride, stride),
            padding="SAME",
            dtype=_dtype(self.compute_dtype),
            param_dtype=jnp.float32,
            name=name,
        )

    def _finish(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        return jnp.clip(x, 0.0, 1.0) if self.clip_output else x


class AnalysisTransform(_TransformBase):
    """Image plane [N,H,W,cin] -> latent [N,H/ds,W/ds,latent_channels] in [0,1].

    ``column_mask`` (optional): callable ``(features, cumulative_stride) ->
    features`` applied after every stage. Used by the spatial-tiling path
    (parallel/spatial.py) to re-impose the whole-image SAME-padding zeros at
    each stage for tiles that sit on a global image edge — without it, zeros
    in the input halo turn into conv-bias garbage at deeper stages and edge
    tiles diverge from the whole-image computation.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, column_mask=None) -> jnp.ndarray:
        m = column_mask if column_mask is not None else (lambda v, s: v)
        x = x.astype(_dtype(self.compute_dtype))
        if self.preset == "base":
            x = m(self._act(self._conv(32, 5, 2, "conv1")(x), "act1"), 2)
            x = m(self._act(self._conv(64, 5, 2, "conv2")(x), "act2"), 4)
            res = x
            x = m(self._act(self._conv(64, 3, 1, "conv3")(x), "act3"), 4)
            x = m(self._act(self._conv(64, 3, 1, "conv4")(x), "act4"), 4)
            x = x + res
            x = m(
                self._act(self._conv(self.latent_channels, 5, 2, "conv8")(x), "act8",
                          final=True), 8
            )
        elif self.preset == "deep":
            x = m(self._act(self._conv(32, 5, 2, "conv1")(x), "act1"), 2)
            x = m(self._act(self._conv(64, 5, 2, "conv2")(x), "act2"), 4)
            res = m(self._act(self._conv(64, 3, 1, "conv3")(x), "act3"), 4)
            res = self._conv(64, 3, 1, "conv4")(res)
            x = m(self._act(x + res, "act4"), 4)
            x = m(self._act(self._conv(64, 5, 2, "conv5")(x), "act5"), 8)
            res = m(self._act(self._conv(64, 3, 1, "conv6")(x), "act6"), 8)
            res = self._conv(64, 3, 1, "conv7")(res)
            x = m(self._act(x + res, "act7"), 8)
            x = m(
                self._act(self._conv(self.latent_channels, 5, 2, "conv8")(x), "act8",
                          final=True),
                16,
            )
        else:
            raise ValueError(f"unknown preset {self.preset!r}")
        return self._finish(x)


class SynthesisTransform(_TransformBase):
    """Latent [N,h,w,latent_channels] -> image plane [N,h*ds,w*ds,out_channels]."""

    out_channels: int = 1

    _GDN_INVERSE = True  # synthesis uses IGDN (the multiplicative inverse)

    @nn.compact
    def __call__(self, x: jnp.ndarray, column_mask=None) -> jnp.ndarray:
        m = column_mask if column_mask is not None else (lambda v, s: v)
        x = x.astype(_dtype(self.compute_dtype))
        if self.preset == "base":
            x = m(self._act(self._convT(64, 5, 2, "dconv1")(x), "act1"), 2)
            res = x
            x = m(self._act(self._convT(64, 3, 1, "dconv5")(x), "act5"), 2)
            x = m(self._act(self._convT(64, 3, 1, "dconv6")(x), "act6"), 2)
            x = x + res
            x = m(self._act(self._convT(64, 5, 2, "dconv7")(x), "act7"), 4)
            x = m(
                self._act(self._convT(self.out_channels, 5, 2, "dconv8")(x), "act8",
                          final=True), 8
            )
        elif self.preset == "deep":
            x = m(self._act(self._convT(64, 5, 2, "dconv1")(x), "act1"), 2)
            res = m(self._act(self._conv(64, 3, 1, "dconv2")(x), "act2"), 2)
            res = self._conv(64, 3, 1, "dconv3")(res)
            x = m(self._act(x + res, "act3"), 2)
            x = m(self._act(self._convT(64, 5, 2, "dconv4")(x), "act4"), 4)
            res = m(self._act(self._conv(64, 3, 1, "dconv5")(x), "act5"), 4)
            res = self._conv(64, 3, 1, "dconv6")(res)
            x = m(self._act(x + res, "act6"), 4)
            x = m(self._act(self._convT(64, 5, 2, "dconv7")(x), "act7"), 8)
            x = m(
                self._act(self._convT(self.out_channels, 5, 2, "dconv8")(x), "act8",
                          final=True),
                16,
            )
        else:
            raise ValueError(f"unknown preset {self.preset!r}")
        return self._finish(x)


def make_transforms(model_cfg) -> tuple[AnalysisTransform, SynthesisTransform]:
    """Build the transform pair from a :class:`config.ModelConfig`."""
    kwargs = dict(
        preset=model_cfg.preset,
        latent_channels=model_cfg.latent_channels,
        leaky_relu_slope=model_cfg.leaky_relu_slope,
        prelu_init=model_cfg.prelu_init,
        clip_output=model_cfg.clip_latent,
        compute_dtype=model_cfg.compute_dtype,
        activation=getattr(model_cfg, "activation", "preset_default"),
        gdn_dtype=getattr(model_cfg, "gdn_dtype", "float32"),
        convt=getattr(model_cfg, "convt", "xla"),
    )
    analysis = AnalysisTransform(**kwargs)
    kwargs["clip_output"] = True  # decoder output is always clipped to [0,1]
    synthesis = SynthesisTransform(out_channels=1, **kwargs)
    return analysis, synthesis

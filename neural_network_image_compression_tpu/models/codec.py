"""End-to-end neural codec: colorspace + dual Y/CbCr transforms + quantizer.

Capability parity with the reference's ``ProClass``/``Encoder``/``Decoder``
orchestration (reference tf2_0/src/utils.py:15-62, tf2_0/src/encoder.py:34-51,
tf2_0/src/decoder.py:35-52): two transform param sets, Y gets its own, **Cb
and Cr share the second** (reference tf2_0/src/utils.py:19-24), latents
concatenated to a [N,h,w,3C] tensor and quantized to uint8 symbols.

TPU-first differences from the reference:
- Chroma planes are batched into one 2N batch for both encode and decode
  (the reference only does this during training, tf2_0/src/training.py:84-85;
  its inference path runs Cb and Cr as separate model calls) — one big conv
  is MXU-friendlier than two half-size ones.
- Params live in one pytree; every function here is pure and jittable.
- Arbitrary image sizes are supported by reflect-padding H,W up to a multiple
  of the downsample factor and cropping after decode (the reference would
  fail on non-multiple sizes because its pack reshape assumes divisibility).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from neural_network_image_compression_tpu.config import Config
from neural_network_image_compression_tpu.models.autoencoder import make_transforms
from neural_network_image_compression_tpu.models.entropy import (
    ChannelContext,
    CheckerboardContext,
    EntropyRegressor,
    FactorizedEntropyModel,
    checkerboard_mask,
    conditional_gaussian_bits,
)
from neural_network_image_compression_tpu.ops import colorspace as cspace
from neural_network_image_compression_tpu.ops.quantize import dequantize, quantize

Params = Any


class NeuralCodec:
    """Functional codec built from a :class:`config.Config`."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.colorspace = cspace.get_colorspace(cfg.codec.colorspace)
        self.analysis, self.synthesis = make_transforms(cfg.model)
        self.latent_channels = cfg.model.latent_channels
        self.downsample = cfg.model.downsample
        self.levels = cfg.quantizer.levels
        self.grid = cfg.quantizer.grid
        if self.grid == "integer" and cfg.model.clip_latent:
            raise ValueError(
                "quantizer.grid='integer' requires model.clip_latent=False "
                "(the integer grid codes an unbounded latent)"
            )
        # Grid-dependent initial geometry of the rate models. Unit-grid
        # symbols use the full [0, L-1] range; integer-grid latents start near
        # zero (symbols near L/2), so a tight initial density/conditional
        # gives the encoder useful rate gradients immediately instead of the
        # near-flat start that pinned round-1 runs at ~8 bpp.
        self._density_span = 128.0 if self.grid == "unit" else 16.0
        self._ctx_scale_init = 64.0 if self.grid == "unit" else 8.0
        self._ctx_mean_span = (
            (self.levels - 1) / 2.0 if self.grid == "unit" else 16.0
        )
        if cfg.entropy.kind == "factorized":
            mk_f = lambda: FactorizedEntropyModel(
                channels=self.latent_channels,
                filters=cfg.entropy.filters,
                levels=self.levels,
                init_scale=self._density_span,
            )
            self.entropy_y = mk_f()
            self.entropy_c = mk_f()
        else:
            self.entropy_y = EntropyRegressor()
            self.entropy_c = None  # regressor is shared across planes, like the
            # reference's single Entropynet (tf2_0/src/training.py:50)
        self.context_y = self.context_c = None
        self.hyper_enc_y = self.hyper_enc_c = None
        self.hyper_dec_y = self.hyper_dec_c = None
        self.hyper_entropy_y = self.hyper_entropy_c = None
        if (
            cfg.entropy.kind == "factorized"
            and cfg.entropy.context in ("hyperprior", "joint")
        ):
            from neural_network_image_compression_tpu.models.hyperprior import (
                HyperDecoder,
                HyperEncoder,
            )

            mk_he = lambda: HyperEncoder(
                hidden=cfg.entropy.context_hidden,
                z_channels=cfg.entropy.hyper_channels,
            )
            mk_hd = lambda: HyperDecoder(
                channels=self.latent_channels,
                hidden=cfg.entropy.context_hidden,
                levels=self.levels,
                scale_min=cfg.entropy.scale_min,
                scale_max=cfg.entropy.scale_max,
                mean_span=self._ctx_mean_span,
                scale_init=self._ctx_scale_init,
                z_span=self._density_span,
            )
            mk_hf = lambda: FactorizedEntropyModel(
                channels=cfg.entropy.hyper_channels,
                filters=cfg.entropy.filters,
                levels=self.levels,
                init_scale=self._density_span,
            )
            self.hyper_enc_y, self.hyper_enc_c = mk_he(), mk_he()
            self.hyper_dec_y, self.hyper_dec_c = mk_hd(), mk_hd()
            self.hyper_entropy_y, self.hyper_entropy_c = mk_hf(), mk_hf()
        if (
            cfg.entropy.kind == "factorized"
            and cfg.entropy.context in ("checkerboard", "joint")
        ):
            mk = lambda: CheckerboardContext(
                channels=self.latent_channels,
                hidden=cfg.entropy.context_hidden,
                levels=self.levels,
                scale_min=cfg.entropy.scale_min,
                scale_max=cfg.entropy.scale_max,
                mean_span=self._ctx_mean_span,
                scale_init=self._ctx_scale_init,
            )
            self.context_y = mk()
            self.context_c = mk()
        if cfg.entropy.kind == "factorized" and cfg.entropy.context == "channel":
            slices = getattr(cfg.entropy, "channel_slices", 4)
            if self.latent_channels % slices:
                raise ValueError(
                    f"latent_channels {self.latent_channels} must be divisible"
                    f" by entropy.channel_slices {slices}"
                )
            mk_ch = lambda: ChannelContext(
                channels=self.latent_channels,
                num_slices=slices,
                hidden=cfg.entropy.context_hidden,
                levels=self.levels,
                scale_min=cfg.entropy.scale_min,
                scale_max=cfg.entropy.scale_max,
                mean_span=self._ctx_mean_span,
                scale_init=self._ctx_scale_init,
            )
            self.context_y = mk_ch()
            self.context_c = mk_ch()

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array, patch_hw: tuple[int, int] = (128, 128)) -> Params:
        h, w = patch_hw
        ds = self.downsample
        k_ay, k_ac, k_sy, k_sc, k_ey, k_ec = jax.random.split(rng, 6)
        plane = jnp.zeros((1, h, w, 1), jnp.float32)
        latent = jnp.zeros((1, h // ds, w // ds, self.latent_channels), jnp.float32)
        params = {
            "analysis_y": self.analysis.init(k_ay, plane)["params"],
            "analysis_c": self.analysis.init(k_ac, plane)["params"],
            "synthesis_y": self.synthesis.init(k_sy, latent)["params"],
            "synthesis_c": self.synthesis.init(k_sc, latent)["params"],
        }
        if isinstance(self.entropy_y, FactorizedEntropyModel):
            params["entropy_y"] = self.entropy_y.init(k_ey, latent)["params"]
            params["entropy_c"] = self.entropy_c.init(k_ec, latent)["params"]
        else:
            params["entropy_y"] = self.entropy_y.init(k_ey, latent)["params"]
        if self.context_y is not None:
            k_cy, k_cc = jax.random.split(jax.random.fold_in(rng, 7))
            # Joint mode: the context net conditions on the masked anchors
            # (C channels) PLUS the hyper head's raw features (2C channels).
            ctx_in = latent
            if self.cfg.entropy.context == "joint":
                ctx_in = jnp.zeros(
                    latent.shape[:3] + (3 * self.latent_channels,), jnp.float32
                )
            params["context_y"] = self.context_y.init(k_cy, ctx_in)["params"]
            params["context_c"] = self.context_c.init(k_cc, ctx_in)["params"]
        if self.hyper_enc_y is not None:
            from neural_network_image_compression_tpu.models.hyperprior import (
                hyper_grid_hw,
            )

            keys = jax.random.split(jax.random.fold_in(rng, 8), 6)
            lh, lw = latent.shape[1:3]
            zh, zw = hyper_grid_hw((lh, lw))
            zlat = jnp.zeros(
                (1, zh, zw, self.cfg.entropy.hyper_channels), jnp.float32
            )
            params["hyper_enc_y"] = self.hyper_enc_y.init(keys[0], latent)["params"]
            params["hyper_enc_c"] = self.hyper_enc_c.init(keys[1], latent)["params"]
            params["hyper_dec_y"] = self.hyper_dec_y.init(
                keys[2], zlat, (lh, lw)
            )["params"]
            params["hyper_dec_c"] = self.hyper_dec_c.init(
                keys[3], zlat, (lh, lw)
            )["params"]
            params["hyper_entropy_y"] = self.hyper_entropy_y.init(keys[4], zlat)[
                "params"
            ]
            params["hyper_entropy_c"] = self.hyper_entropy_c.init(keys[5], zlat)[
                "params"
            ]
        return params

    # ------------------------------------------------------- plane transforms

    def encode_planes(
        self, params: Params, planes: jnp.ndarray, column_mask=None
    ) -> jnp.ndarray:
        """Colour planes [N,H,W,3] float -> latents [N,h,w,3C] float in [0,1].

        ``column_mask`` is forwarded to the transforms for the spatial-tiling
        path (see models/autoencoder.py)."""
        n = planes.shape[0]
        y = planes[..., 0:1]
        # Stack Cb and Cr along the batch axis: one 2N conv call.
        c = jnp.concatenate([planes[..., 1:2], planes[..., 2:3]], axis=0)
        lat_y = self._apply_analysis(params["analysis_y"], y, column_mask)
        lat_c = self._apply_analysis(params["analysis_c"], c, column_mask)
        return jnp.concatenate([lat_y, lat_c[:n], lat_c[n:]], axis=3)

    def _resolved_activation(self) -> str:
        kind = self.cfg.model.activation
        if kind == "preset_default":
            return "prelu" if self.cfg.model.preset == "deep" else "leaky_relu"
        return kind

    def _pallas_compatible_activation(self) -> bool:
        """The Pallas kernels fuse the preset's own activation (leaky_relu
        for 'base', PReLU for 'deep') and support GDN on the 'base' preset
        via the inter-stage gdn_apply path (ops/pallas_conv.py); other
        cross-preset overrides route through the Flax/XLA path."""
        kind = self._resolved_activation()
        native = "prelu" if self.cfg.model.preset == "deep" else "leaky_relu"
        if kind == native:
            return True
        return kind == "gdn" and self.cfg.model.preset == "base"

    def _apply_analysis(self, p, x, column_mask=None):
        # 'auto' picks the faster engine per transform (measured on v5e,
        # benchmarks/pallas_bench.py): XLA for analysis (the pallas path pays
        # 32x DMA amplification padding the 1-channel input to 128 lanes),
        # pallas for synthesis (phase-decomposed transposed convs beat XLA's
        # dilated-conv lowering by ~1.2x). column_mask (spatial tiling)
        # passes straight through — the kernels interpose it between stages.
        if self.cfg.model.backend == "pallas" and self._pallas_compatible_activation():
            from neural_network_image_compression_tpu.ops import pallas_conv as pc

            if self.cfg.model.preset == "base":
                return pc.pallas_analysis_base(
                    p, x,
                    slope=self.cfg.model.leaky_relu_slope,
                    clip=self.cfg.model.clip_latent,
                    mask=column_mask,
                    gdn=self._resolved_activation() == "gdn",
                )
            return pc.pallas_analysis_deep(
                p, x, clip=self.cfg.model.clip_latent, mask=column_mask
            )
        return self.analysis.apply({"params": p}, x, column_mask)

    def _apply_synthesis(self, p, x, column_mask=None):
        # 'auto': pallas synthesis only in float32 — in bfloat16 XLA's native
        # lowering is faster for both transforms (measured on v5e).
        use_pallas = (
            self.cfg.model.backend == "pallas"
            or (
                self.cfg.model.backend == "auto"
                and self.cfg.model.compute_dtype == "float32"
            )
        ) and self._pallas_compatible_activation()
        if use_pallas:
            from neural_network_image_compression_tpu.ops import pallas_conv as pc

            if self.cfg.model.preset == "base":
                return pc.pallas_synthesis_base(
                    p, x, slope=self.cfg.model.leaky_relu_slope, clip=True,
                    mask=column_mask,
                    gdn=self._resolved_activation() == "gdn",
                )
            return pc.pallas_synthesis_deep(p, x, clip=True, mask=column_mask)
        return self.synthesis.apply({"params": p}, x, column_mask)

    def decode_planes(
        self, params: Params, latents: jnp.ndarray, column_mask=None
    ) -> jnp.ndarray:
        """Latents [N,h,w,3C] float -> colour planes [N,H,W,3] float in [0,1]."""
        cch = self.latent_channels
        lat_y = latents[..., :cch]
        lat_c = jnp.concatenate(
            [latents[..., cch : 2 * cch], latents[..., 2 * cch :]], axis=0
        )
        n = latents.shape[0]
        pl_y = self._apply_synthesis(params["synthesis_y"], lat_y, column_mask)
        pl_c = self._apply_synthesis(params["synthesis_c"], lat_c, column_mask)
        return jnp.concatenate([pl_y, pl_c[:n], pl_c[n:]], axis=3)

    # ------------------------------------------------------------- full paths

    def _pad(self, rgb: jnp.ndarray) -> jnp.ndarray:
        ds = self.downsample
        h, w = rgb.shape[1:3]
        ph = (-h) % ds
        pw = (-w) % ds
        if ph or pw:
            rgb = jnp.pad(rgb, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        return rgb

    def encode(self, params: Params, rgb_u8: jnp.ndarray) -> jnp.ndarray:
        """uint8 RGB [N,H,W,3] -> uint8 latent symbols [N,h,w,3C].

        Mirrors reference tf2_0/src/encoder.py:38-47: /255 -> colorspace ->
        per-plane analysis -> concat -> round(x*255) uint8.
        """
        rgb = self._pad(rgb_u8).astype(jnp.float32) / 255.0
        planes = cspace.rgb_to_planes(rgb, self.colorspace)
        latents = self.encode_planes(params, planes)
        return quantize(latents, self.levels, self.grid)

    def decode(self, params: Params, sym_u8: jnp.ndarray,
               out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
        """uint8 latent symbols [N,h,w,3C] -> uint8 RGB [N,H,W,3].

        Mirrors reference tf2_0/src/decoder.py:39-48: /255 -> per-plane
        synthesis -> inverse colorspace -> clip -> round uint8. ``out_hw``
        crops away the encoder's divisibility padding.
        """
        latents = dequantize(sym_u8, self.levels, self.grid)
        planes = self.decode_planes(params, latents)
        rgb = jnp.clip(cspace.planes_to_rgb(planes, self.colorspace), 0.0, 1.0)
        rgb = jnp.round(rgb * 255.0).astype(jnp.uint8)
        if out_hw is not None:
            rgb = rgb[:, : out_hw[0], : out_hw[1], :]
        return rgb

    def forward(self, params: Params, rgb_u8: jnp.ndarray) -> jnp.ndarray:
        """Full quantized round-trip (the flagship jittable forward step)."""
        sym = self.encode(params, rgb_u8)
        return self.decode(params, sym, out_hw=rgb_u8.shape[1:3])

    # ------------------------------------------------------------------ rate

    def _context_input(self, z_sym: jnp.ndarray) -> jnp.ndarray:
        """Mask to anchors and normalize to ~unit range (the context net's
        input convention). z_sym: [M,h,w,C] symbol-unit values. Unit grid:
        symbols span [0, L-1] -> [-1, 1]. Integer grid: recentre by L/2 and
        divide by the density span so typical latents land in ~[-1, 1]."""
        mask = checkerboard_mask(z_sym.shape[1], z_sym.shape[2], z_sym.dtype)
        if self.grid == "integer":
            return (z_sym - self.levels // 2) / self._density_span * mask
        return (z_sym / (self.levels - 1) - 0.5) * 2.0 * mask

    def context_params(self, params: Params, which: str,
                       z_sym: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Conditional Gaussian (mean, scale) [M,h,w,C] in symbol units for a
        plane batch, computed from its anchor positions only. ``which`` is
        'y' or 'c' (Cb and Cr share the 'c' net, like the transforms)."""
        mod = self.context_y if which == "y" else self.context_c
        if mod is None or isinstance(mod, ChannelContext):
            raise TypeError("context_params requires entropy.context='checkerboard'")
        return mod.apply(
            {"params": params[f"context_{which}"]}, self._context_input(z_sym)
        )

    def _norm_latent(self, z_sym: jnp.ndarray) -> jnp.ndarray:
        """Normalize symbol-grid values to ~unit range WITHOUT spatial
        masking (the channel context conditions on whole already-coded
        channel slices at every position)."""
        if self.grid == "integer":
            return (z_sym - self.levels // 2) / self._density_span
        return (z_sym / (self.levels - 1) - 0.5) * 2.0

    def channel_params(self, params: Params, which: str,
                       z_sym: jnp.ndarray, only_slice: int | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Channel-context conditional Gaussian (mean, scale)
        [M,h,w,C - C/slices] in symbol units, covering channels
        [C/slices:]. Slice s's stack reads only channels [: s*width], so
        calling this on a partially-decoded grid yields exact parameters for
        the next undecoded slice (models/entropy.py ChannelContext).
        ``only_slice=s`` runs just that slice's stack — the progressive
        decoder's per-pass call."""
        mod = self.context_y if which == "y" else self.context_c
        if not isinstance(mod, ChannelContext):
            raise TypeError("channel_params requires entropy.context='channel'")
        return mod.apply(
            {"params": params[f"context_{which}"]}, self._norm_latent(z_sym),
            only_slice,
        )

    def plane_bits(self, params: Params, which: str,
                   z_sym: jnp.ndarray) -> jnp.ndarray:
        """Differentiable bits [M,h,w,C] for one plane batch in symbol units:
        factorized everywhere when context='none'; with the checkerboard
        context, factorized at anchors + conditional Gaussian elsewhere; with
        the channel context, factorized on slice 0 + conditional Gaussian on
        the remaining channel slices."""
        ent = self.entropy_y if which == "y" else self.entropy_c
        bits_f = ent.apply({"params": params[f"entropy_{which}"]}, z_sym)
        if self.context_y is None:
            return bits_f
        if self.cfg.entropy.context == "joint":
            raise TypeError(
                "plane_bits is undefined for context='joint' (every position "
                "is conditionally coded and needs the transmitted hyper "
                "latent); use plane_rate_bits"
            )
        if self.cfg.entropy.context == "channel":
            width = self.latent_channels // self.context_y.num_slices
            mean, scale = self.channel_params(params, which, z_sym)
            bits_cond = conditional_gaussian_bits(
                z_sym[..., width:], mean, scale
            )
            return jnp.concatenate([bits_f[..., :width], bits_cond], axis=-1)
        mask = checkerboard_mask(z_sym.shape[1], z_sym.shape[2], z_sym.dtype)
        mean, scale = self.context_params(params, which, z_sym)
        bits_ctx = conditional_gaussian_bits(z_sym, mean, scale)
        return bits_f * mask + bits_ctx * (1.0 - mask)

    # ------------------------------------------------------------ hyperprior

    def _norm_symbols(self, z_sym: jnp.ndarray) -> jnp.ndarray:
        """Symbol-grid values -> ~unit-range input for the hyper-encoder."""
        center = (self.levels - 1) / 2.0
        return (z_sym - center) / self._density_span

    def hyper_z(self, params: Params, which: str, z_sym: jnp.ndarray) -> jnp.ndarray:
        """Continuous hyper latent [M,hz,wz,Zc] in CENTERED symbol units for a
        plane batch on the symbol grid. ``which`` is 'y' or 'c'."""
        enc = self.hyper_enc_y if which == "y" else self.hyper_enc_c
        if enc is None:
            raise TypeError("hyper_z requires entropy.context='hyperprior'")
        return enc.apply(
            {"params": params[f"hyper_enc_{which}"]}, self._norm_symbols(z_sym)
        )

    def hyper_conditional(
        self, params: Params, which: str, z_centered: jnp.ndarray,
        out_hw: tuple[int, int],
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, scale) [M,h,w,C] in symbol units from a (noisy or decoded)
        CENTERED hyper latent."""
        dec = self.hyper_dec_y if which == "y" else self.hyper_dec_c
        return dec.apply(
            {"params": params[f"hyper_dec_{which}"]}, z_centered, out_hw
        )

    def hyper_raw(self, params: Params, which: str, z_centered: jnp.ndarray,
                  out_hw: tuple[int, int]) -> jnp.ndarray:
        """Raw hyper-head features [M,h,w,2C] (pre mean/scale geometry) from a
        (noisy or decoded) CENTERED hyper latent — the joint context's
        conditioning input."""
        from neural_network_image_compression_tpu.models.hyperprior import (
            HyperDecoder,
        )

        dec = self.hyper_dec_y if which == "y" else self.hyper_dec_c
        return dec.apply(
            {"params": params[f"hyper_dec_{which}"]}, z_centered, out_hw,
            method=HyperDecoder.raw,
        )

    def joint_conditionals(
        self, params: Params, which: str, z_sym: jnp.ndarray,
        raw: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Joint-mode conditionals for one plane batch.

        Returns (mean_h, scale_h, mean_j, scale_j), all [M,h,w,C] in symbol
        units: the hyper-only Gaussian (codes the ANCHOR half — replacing the
        checkerboard mode's static factorized tables there) and the joint
        Gaussian from the context net over [masked anchors ++ raw hyper
        features] (codes the non-anchor half with strictly more information
        than either the checkerboard or the hyperprior alone).
        """
        from neural_network_image_compression_tpu.models.hyperprior import (
            head_geometry,
        )

        mod = self.context_y if which == "y" else self.context_c
        mean_h, scale_h = head_geometry(
            raw, self.levels, self._ctx_mean_span, self._ctx_scale_init,
            self.cfg.entropy.scale_min, self.cfg.entropy.scale_max,
        )
        ctx_in = jnp.concatenate([self._context_input(z_sym), raw], axis=-1)
        mean_j, scale_j = mod.apply({"params": params[f"context_{which}"]}, ctx_in)
        return mean_h, scale_h, mean_j, scale_j

    def _hyper_bits(self, params: Params, which: str, z_centered: jnp.ndarray):
        ent = self.hyper_entropy_y if which == "y" else self.hyper_entropy_c
        center = (self.levels - 1) / 2.0
        return ent.apply(
            {"params": params[f"hyper_entropy_{which}"]}, z_centered + center
        )

    def plane_rate_bits(self, params: Params, which: str, z_sym: jnp.ndarray,
                        key: jax.Array | None = None) -> jnp.ndarray:
        """[M] TOTAL differentiable bits per item for one plane batch in
        symbol units — including transmitted side information (the hyper
        latent's own factorized bits, when context='hyperprior'). ``key``
        draws the hyper latent's one-bin quantization noise."""
        if self.hyper_enc_y is not None:
            z = self.hyper_z(params, which, z_sym)
            if key is not None:
                z = z + jax.random.uniform(key, z.shape, minval=-0.5, maxval=0.5)
            bits_z = self._hyper_bits(params, which, z)
            if self.cfg.entropy.context == "joint":
                raw = self.hyper_raw(params, which, z, z_sym.shape[1:3])
                mean_h, scale_h, mean_j, scale_j = self.joint_conditionals(
                    params, which, z_sym, raw
                )
                mask = checkerboard_mask(
                    z_sym.shape[1], z_sym.shape[2], z_sym.dtype
                )
                bits_y = conditional_gaussian_bits(
                    z_sym, mean_h, scale_h
                ) * mask + conditional_gaussian_bits(
                    z_sym, mean_j, scale_j
                ) * (1.0 - mask)
            else:
                mean, scale = self.hyper_conditional(
                    params, which, z, z_sym.shape[1:3]
                )
                bits_y = conditional_gaussian_bits(z_sym, mean, scale)
            return jnp.sum(bits_y, axis=(1, 2, 3)) + jnp.sum(bits_z, axis=(1, 2, 3))
        return jnp.sum(self.plane_bits(params, which, z_sym), axis=(1, 2, 3))

    def hyper_pmf_tables(self, params: Params) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(pmf_zy [Zc,L], pmf_zc [Zc,L]) for the hyper latent's rANS tables."""
        if self.hyper_entropy_y is None:
            raise TypeError("hyper_pmf_tables requires entropy.context='hyperprior'")
        pmf_y = self.hyper_entropy_y.apply(
            {"params": params["hyper_entropy_y"]},
            method=FactorizedEntropyModel.pmf,
        )
        pmf_c = self.hyper_entropy_c.apply(
            {"params": params["hyper_entropy_c"]},
            method=FactorizedEntropyModel.pmf,
        )
        return pmf_y, pmf_c

    def latent_bits(self, params: Params, latents_sym_units: jnp.ndarray) -> jnp.ndarray:
        """Differentiable bits per element for [N,h,w,3C] symbol-grid values
        (factorized entropy model only). Returns [N,h,w,3C]."""
        if not isinstance(self.entropy_y, FactorizedEntropyModel):
            raise TypeError("latent_bits requires the factorized entropy model")
        cch = self.latent_channels
        n = latents_sym_units.shape[0]
        bits_y = self.plane_bits(params, "y", latents_sym_units[..., :cch])
        zc = jnp.concatenate(
            [latents_sym_units[..., cch : 2 * cch], latents_sym_units[..., 2 * cch :]],
            axis=0,
        )
        bits_c = self.plane_bits(params, "c", zc)
        return jnp.concatenate([bits_y, bits_c[:n], bits_c[n:]], axis=3)

    def estimated_bpp(self, params: Params, sym: jnp.ndarray,
                      hw_pixels: int) -> jnp.ndarray:
        """[N] on-chip rate ESTIMATE (bpp) for quantized symbol grids
        [N,h,w,3C] under the factorized density — encode-time rate reporting
        without host entropy coding (the north star's "rate estimation uses
        the learned CDF evaluated on-chip"). On TPU this runs the fused
        Pallas kernel (ops/pallas_entropy.py: whole CDF chain in VMEM, no
        HBM intermediates); elsewhere the XLA chain. For context-model
        codecs this is the factorized upper bound (anchors' own density);
        the exact rate is the container byte count. Used by trainer
        validation (``est_bpp`` in metrics.jsonl) and parity-gated in
        bench.py like the conv kernels."""
        if not isinstance(self.entropy_y, FactorizedEntropyModel):
            raise TypeError("estimated_bpp requires the factorized entropy model")
        fn = getattr(self, "_est_bpp_fn", None)
        if fn is None:
            use_pallas = jax.default_backend() == "tpu"

            def f(params, sym):
                z = sym.astype(jnp.float32)
                cch = self.latent_channels
                n = sym.shape[0]
                zy = z[..., :cch]
                zc = jnp.concatenate(
                    [z[..., cch : 2 * cch], z[..., 2 * cch :]], axis=0
                )
                if use_pallas:
                    from neural_network_image_compression_tpu.ops import (
                        pallas_entropy as pe,
                    )

                    bits_y = pe.factorized_bits_pallas(
                        zy, params["entropy_y"], self.levels
                    )
                    bits_c = pe.factorized_bits_pallas(
                        zc, params["entropy_c"], self.levels
                    )
                else:
                    bits_y = self.entropy_y.apply(
                        {"params": params["entropy_y"]}, zy
                    )
                    bits_c = self.entropy_c.apply(
                        {"params": params["entropy_c"]}, zc
                    )
                total = (
                    jnp.sum(bits_y, axis=(1, 2, 3))
                    + jnp.sum(bits_c[:n], axis=(1, 2, 3))
                    + jnp.sum(bits_c[n:], axis=(1, 2, 3))
                )
                return total

            fn = self._est_bpp_fn = jax.jit(f)
        return fn(params, sym) / hw_pixels

    def pmf_tables(self, params: Params) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(pmf_y [C,L], pmf_c [C,L]) for building rANS coding tables."""
        if not isinstance(self.entropy_y, FactorizedEntropyModel):
            raise TypeError("pmf_tables requires the factorized entropy model")
        pmf_y = self.entropy_y.apply(
            {"params": params["entropy_y"]}, method=FactorizedEntropyModel.pmf
        )
        pmf_c = self.entropy_c.apply(
            {"params": params["entropy_c"]}, method=FactorizedEntropyModel.pmf
        )
        return pmf_y, pmf_c

"""Rate-distortion training step — one jitted XLA program.

Semantics map to the reference tf2_0 eager loop (tf2_0/src/training.py:72-149)
but restructured TPU-first:

- The reference runs 3 GradientTapes + 3 Adam optimizers over disjoint
  variable sets (Y codec, CbCr codec, entropy net). Adam is per-parameter, so
  a SINGLE optimizer over one combined loss with disjoint parameter groups
  produces identical updates — and compiles to one fused program instead of
  three backward passes.
- Chroma is batched [Cb;Cr] along the batch axis (the reference does this for
  training too, tf2_0/src/training.py:84-85).
- Rate term: default is the factorized entropy model's differentiable bits
  (true rate, trains end-to-end). The reference-faithful mode instead uses
  the Entropynet regressor's *prediction* in the R-D loss and trains the
  regressor against a bpp target (PNG host-callback proxy, or the factorized
  bits) with the reference's exact gradient-flow structure: main losses do
  not update regressor params, the regressor MSE does not update the encoder
  (reference tf2_0/src/training.py:135-149).
- The uniform-noise quantization surrogate goes to the decoder; the rate
  model sees the noisy latent by default (``noise_to_rate_model=True``, the
  statistically correct choice) or the clean latent to mirror the reference's
  quirk (tf2_0/src/training.py:90-95).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from neural_network_image_compression_tpu.config import Config
from neural_network_image_compression_tpu.models.codec import NeuralCodec
from neural_network_image_compression_tpu.models.entropy import FactorizedEntropyModel
from neural_network_image_compression_tpu.ops import colorspace as cspace
from neural_network_image_compression_tpu.ops import metrics as M
from neural_network_image_compression_tpu.ops.quantize import (
    noise_surrogate,
    ste_round,
    to_symbol_units,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray        # int32 scalar
    rd_lambda: jnp.ndarray   # float32 scalar (annealed per epoch)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam over all params; with ``freeze_transforms``, the analysis/
    synthesis groups get ``optax.set_to_zero()`` (a true freeze — zeroing
    *gradients* under Adam still produces updates while the first moment
    decays if the moments were restored nonzero). With ``gdn_lr_scale``,
    the GDN beta/gamma parameters (module names ``*_gdn``) get their own
    Adam at ``learning_rate * gdn_lr_scale`` — the targeted damper for the
    GDN+STE instability (RESULTS.md §8.3: the runaway is specifically the
    norm parameters amplifying under STE's unsmoothed gradient)."""
    gdn_scale = getattr(cfg.train, "gdn_lr_scale", None)
    clip = getattr(cfg.train, "grad_clip_norm", None)

    def adam_at(lr):
        tx = optax.adam(lr)
        if clip is not None:
            # Inside multi_transform the clip norm is over the group's own
            # subtree — a stricter (per-group) bound than one global norm.
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        return tx

    base = adam_at(cfg.train.learning_rate)
    if not cfg.train.freeze_transforms and gdn_scale is None:
        return base

    def labels(params):
        def lbl(path, _):
            keys = [str(getattr(p, "key", p)) for p in path]
            if cfg.train.freeze_transforms and keys and keys[0].startswith(
                ("analysis", "synthesis")
            ):
                return "freeze"
            if gdn_scale is not None and any("_gdn" in k for k in keys):
                return "gdn"
            return "train"

        return jax.tree_util.tree_map_with_path(lbl, params)

    groups = {"train": base, "freeze": optax.set_to_zero()}
    if gdn_scale is not None:
        groups["gdn"] = adam_at(cfg.train.learning_rate * gdn_scale)
    return optax.multi_transform(groups, labels)


def init_train_state(codec: NeuralCodec, rng: jax.Array, cfg: Config) -> TrainState:
    params = codec.init(rng, (cfg.data.patch_size, cfg.data.patch_size))
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rd_lambda=jnp.asarray(cfg.train.rd_lambda, jnp.float32),
    )


def _random_flips(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Per-image random horizontal/vertical flips (reference
    tf2_0/src/training.py:77-78)."""
    kh, kv = jax.random.split(key)
    flip_h = jax.random.bernoulli(kh, 0.5, (x.shape[0], 1, 1, 1))
    flip_v = jax.random.bernoulli(kv, 0.5, (x.shape[0], 1, 1, 1))
    x = jnp.where(flip_h, x[:, :, ::-1, :], x)
    return jnp.where(flip_v, x[:, ::-1, :, :], x)


def _distortion(cfg: Config, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-image distortion loss term. a, b: [N,H,W,1] planes in [0,1]."""
    kind = cfg.train.distortion
    if kind == "ssim":
        return (1.0 - M.ssim(a, b)) / 2.0  # reference tf2_0/src/training.py:109
    if kind == "ms_ssim":
        # Auto-truncate scales so 11-px windows fit the patch at every level
        # (the full 5-scale stack needs >=176 px; training patches are 128).
        n_scales = 1
        min_hw = min(a.shape[1], a.shape[2])
        while n_scales < 5 and min_hw // (2**n_scales) >= 11:
            n_scales += 1
        pf = M._MS_SSIM_POWER_FACTORS[:n_scales]
        return (1.0 - M.ms_ssim(a, b, power_factors=pf)) / 2.0
    if kind == "mse":
        return jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    raise ValueError(f"unknown distortion {kind!r}")


def _surrogate(
    cfg: Config, latent: jnp.ndarray, key: jax.Array, step: jnp.ndarray | None = None
) -> jnp.ndarray:
    kind = cfg.quantizer.surrogate
    levels = cfg.quantizer.levels
    grid = cfg.quantizer.grid
    if kind == "noise":
        return noise_surrogate(latent, key, levels, grid)
    if kind == "ste":
        return ste_round(latent, levels, grid)
    if kind == "noise+ste":
        # noise for the rate path handled separately; decoder sees STE.
        # ste_warmup_steps delays the switch: the first N steps use the
        # smooth noise surrogate so the GDN scales settle before the raw
        # rounding gradient arrives (the traced ``step`` keeps the program
        # static — one compile, the branch is a select).
        ste = ste_round(latent, levels, grid)
        warm = getattr(cfg.train, "ste_warmup_steps", 0)
        if warm and step is not None:
            noise = noise_surrogate(latent, key, levels, grid)
            return jnp.where(step >= warm, ste, noise)
        return ste
    raise ValueError(f"unknown surrogate {kind!r}")


def make_train_step(codec: NeuralCodec, cfg: Config) -> Callable:
    """Returns train_step(state, batch_u8, key) -> (state, metrics_dict)."""
    tx = make_optimizer(cfg)
    cs = codec.colorspace
    factorized = isinstance(codec.entropy_y, FactorizedEntropyModel)
    levels = cfg.quantizer.levels
    cch = codec.latent_channels

    needs_rate_target = (not factorized) and cfg.entropy.regressor_target == "png"

    def loss_fn(params, batch_u8, key, rd_lambda, rate_target=None, step=None):
        n = batch_u8.shape[0]
        hw_pixels = batch_u8.shape[1] * batch_u8.shape[2]
        # NOTE: keep this split arity in sync with make_rate_latents_fn (the
        # reference-faithful PNG target must see the same flip augmentation).
        k_aug, k_noise_y, k_noise_c, k_rate, kz_y, kz_c = jax.random.split(key, 6)

        x = batch_u8.astype(jnp.float32) / 255.0
        if cfg.train.augment_flips:
            x = _random_flips(x, k_aug)
        planes = cspace.rgb_to_planes(x, cs)
        plane_y = planes[..., 0:1]
        plane_c = jnp.concatenate([planes[..., 1:2], planes[..., 2:3]], axis=0)

        lat_y = codec.analysis.apply({"params": params["analysis_y"]}, plane_y)
        lat_c = codec.analysis.apply({"params": params["analysis_c"]}, plane_c)

        noisy_y = _surrogate(cfg, lat_y, k_noise_y, step)
        noisy_c = _surrogate(cfg, lat_c, k_noise_c, step)

        dec_y = codec.synthesis.apply({"params": params["synthesis_y"]}, noisy_y)
        dec_c = codec.synthesis.apply({"params": params["synthesis_c"]}, noisy_c)

        d_y = _distortion(cfg, plane_y, dec_y)          # [N]
        d_c = _distortion(cfg, plane_c, dec_c)          # [2N]

        # ----- rate term ------------------------------------------------
        # Symbol-grid positions of the latent (unit grid: y*(L-1); integer
        # grid: y + L//2) with one bin of noise — the surrogate the density
        # integrates over.
        grid = cfg.quantizer.grid
        if cfg.quantizer.noise_to_rate_model:
            kr_y, kr_c = jax.random.split(k_rate)
            z_y = to_symbol_units(lat_y, levels, grid) + jax.random.uniform(
                kr_y, lat_y.shape, minval=-0.5, maxval=0.5
            )
            z_c = to_symbol_units(lat_c, levels, grid) + jax.random.uniform(
                kr_c, lat_c.shape, minval=-0.5, maxval=0.5
            )
        else:
            z_y = to_symbol_units(lat_y, levels, grid)
            z_c = to_symbol_units(lat_c, levels, grid)

        aux_loss = jnp.zeros(())
        if factorized:
            # plane_rate_bits routes through the conditional rate model when
            # one is enabled: checkerboard (factorized anchors + conditional
            # Gaussian) or hyperprior (dense conditional + transmitted side
            # bits, which the keys' one-bin noise dithers).
            bpp_y = codec.plane_rate_bits(params, "y", z_y, kz_y) / hw_pixels  # [N]
            bpp_c = codec.plane_rate_bits(params, "c", z_c, kz_c) / hw_pixels  # [2N]
            rate_y, rate_c = bpp_y, bpp_c
        else:
            # Reference-faithful Entropynet path. Main loss uses predictions
            # with regressor params frozen; regressor trains on MSE with the
            # encoder frozen (reference's two-tape structure). The PNG target
            # is computed on the HOST between dispatches (make_rate_latents_fn
            # + ops.png_proxy.png_bpp_host) and passed in as ``rate_target``
            # — the axon TPU plugin has no host-callback support, and hoisting
            # the host work out of the jit keeps the step a pure XLA program.
            lat_all = jnp.concatenate([lat_y, lat_c], axis=0)
            frozen = jax.lax.stop_gradient(params["entropy_y"])
            pred_main = codec.entropy_y.apply({"params": frozen}, lat_all)  # [3N,1]
            rate_y = pred_main[:n, 0]
            rate_c = pred_main[n:, 0]
            pred_aux = codec.entropy_y.apply(
                {"params": params["entropy_y"]}, jax.lax.stop_gradient(lat_all)
            )
            if rate_target is None:
                raise ValueError(
                    "regressor mode requires the PNG rate target as a step "
                    "input: train_step(state, batch, key, rate_target)"
                )
            target = rate_target
            aux_loss = jnp.mean((pred_aux - target) ** 2)
            bpp_y, bpp_c = target[:n, 0], target[n:, 0]

        chroma_lambda = (
            cfg.train.chroma_lambda
            if cfg.train.chroma_lambda is not None
            else rd_lambda
        )
        loss_y = jnp.mean(d_y) + rd_lambda * jnp.mean(rate_y)
        loss_c = jnp.mean(d_c) + chroma_lambda * jnp.mean(rate_c)
        total = loss_y + loss_c + aux_loss

        metrics = {
            "loss": total,
            "loss_y": loss_y,
            "loss_c": loss_c,
            "aux_loss": aux_loss,
            "distortion_y": jnp.mean(d_y),
            "distortion_c": jnp.mean(d_c),
            "bpp_y": jnp.mean(bpp_y),
            "bpp_cb": jnp.mean(bpp_c[:n]),
            "bpp_cr": jnp.mean(bpp_c[n:]),
        }
        if cfg.train.distortion == "ssim":
            metrics["ssim_y"] = 1.0 - 2.0 * jnp.mean(d_y)
            metrics["ssim_cb"] = 1.0 - 2.0 * jnp.mean(d_c[:n])
            metrics["ssim_cr"] = 1.0 - 2.0 * jnp.mean(d_c[n:])
        return total, metrics

    def _step(state, batch_u8, key, rate_target):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch_u8, key, state.rd_lambda, rate_target, state.step
        )
        # freeze_transforms is enforced by the optimizer itself
        # (make_optimizer: optax.set_to_zero() on the transform subtrees).
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            rd_lambda=state.rd_lambda,
        )
        return new_state, metrics

    if needs_rate_target:
        def train_step(state: TrainState, batch_u8, key, rate_target):
            return _step(state, batch_u8, key, rate_target)
    else:
        def train_step(state: TrainState, batch_u8, key):
            return _step(state, batch_u8, key, None)
    train_step.needs_rate_target = needs_rate_target
    return train_step


def make_rate_latents_fn(codec: NeuralCodec, cfg: Config) -> Callable:
    """Jittable (params, batch_u8, key) -> clean latents [3N,h,w,C] with the
    SAME flip augmentation as the train step (identical key split), so the
    host-computed PNG rate target matches the latents inside the step."""
    cs = codec.colorspace

    def f(params, batch_u8, key):
        # Same split arity as loss_fn so k_aug (and thus the flips) match.
        k_aug = jax.random.split(key, 6)[0]
        x = batch_u8.astype(jnp.float32) / 255.0
        if cfg.train.augment_flips:
            x = _random_flips(x, k_aug)
        planes = cspace.rgb_to_planes(x, cs)
        plane_y = planes[..., 0:1]
        plane_c = jnp.concatenate([planes[..., 1:2], planes[..., 2:3]], axis=0)
        lat_y = codec.analysis.apply({"params": params["analysis_y"]}, plane_y)
        lat_c = codec.analysis.apply({"params": params["analysis_c"]}, plane_c)
        return jnp.concatenate([lat_y, lat_c], axis=0)

    return f

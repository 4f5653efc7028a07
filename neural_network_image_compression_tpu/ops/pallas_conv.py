"""Pallas TPU kernels for the codec's hot conv path.

Design: ONE core kernel — a fused 3x3 VALID stride-1 convolution with
bias + leaky_relu + optional residual + optional clip epilogue — and cheap
XLA-side data rearrangements that map every layer of the reference topology
onto it (reference tf2_0/src/encoder.py:10-17, decoder.py:10-17):

- 3x3/s1 SAME conv:        pad 1          -> core kernel
- 5x5/s2 SAME conv:        space-to-depth -> 3x3/s1 conv over 4C channels.
  This is the key TPU trick: C=32/64 inputs become 128/256 channels, filling
  the MXU's 128-wide contraction lanes instead of leaving them 25-75% idle.
- 3x3/s1 SAME conv-transpose: identical operator to the 3x3 SAME conv
  (verified against lax.conv_transpose: for stride 1 the dilation is a no-op
  and XLA's transpose uses the kernel unflipped in correlation form).
- 5x5/s2 SAME conv-transpose: phase decomposition — each output-pixel parity
  phase (p,q) in {0,1}^2 is a 3x3 VALID conv with the weight subset
  w[2d+3-p, 2e+3-q]; all four phases fuse into one kernel call with 4*Cout
  output channels, interleaved afterwards. No zero-stuffed dilated input, no
  overlap-add — pure dense MXU work.

The kernel itself: grid over (batch, row-tiles); the input stays in HBM and
row stripes are DMA'd into VMEM (double-buffered across the sequential TPU
grid), the 9 taps accumulate as [TH*W, C] @ [C, Cout] MXU matmuls in f32,
the epilogue runs on the VPU, and the output tile is DMA'd back to HBM.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM budget for the explicit scratch buffers. The 16MB hardware
# limit also covers the kernel's value stack (the loaded stripe, the f32
# accumulator, per-tap temporaries), which roughly doubles the footprint —
# hence the conservative cap.
_VMEM_BUDGET = 8 * 1024 * 1024


def _sublane_granule(itemsize: int) -> int:
    """Minimum sublane alignment for the dtype: (8,128) tiles for f32,
    (16,128) for bf16, (32,128) for int8/fp8."""
    return {4: 8, 2: 16, 1: 32}[itemsize]


def _pick_tile_rows(kh, wp8, cin_k, out_w8, cout_k, itemsize, has_res):
    """Largest output-rows-per-step (granule multiple) whose scratch fits
    VMEM: 2-slot input stripe + 2-slot output tile (+ residual tile)."""
    g = _sublane_granule(itemsize)
    for th in (4 * g, 3 * g, 2 * g, g):
        stripe = 2 * (th + kh - 1) * wp8 * cin_k * itemsize
        otile = 2 * th * out_w8 * cout_k * itemsize
        rtile = th * out_w8 * cout_k * itemsize if has_res else 0
        if stripe + otile + rtile <= _VMEM_BUDGET:
            return th
    return g


def _auto_interpret(flag):
    """None -> interpret on CPU (no Mosaic there), compiled elsewhere."""
    if flag is None:
        return jax.default_backend() == "cpu"
    return flag


# Default for the tap-concat contraction (see conv3x3_valid_fused). Off until
# measured faster on the target chip; NNIC_TAP_CONCAT=1 flips it fleet-wide
# for A/B runs without code edits.
_TAP_DEFAULT = os.environ.get("NNIC_TAP_CONCAT", "0") == "1"


def _auto_tap(flag, cin):
    """None -> env default, and never for cin already lane-aligned (the
    concat relayout can only lose when the per-tap matmuls have no pad
    waste)."""
    if cin % 128 == 0:
        return False
    return _TAP_DEFAULT if flag is None else flag



def _epilogue(y, b, slope, res, add_before_act, clip,
              gdn=None, gamma2=None, beta2=None, beta_min=1e-6):
    """slope: None (no activation), a float (leaky_relu), or a [1, Cout]
    array value (PReLU per-channel alpha, reference tf1_13/src/utils.py:17-25).

    ``gdn``: 'fwd'/'inv' fuses the divisive normalization INTO the kernel —
    the channel mix ``y^2 @ gamma2`` is one [TH*W, C] x [C, C] MXU matmul on
    the f32 accumulator, the rsqrt/div runs on the VPU, and the stage
    activation never round-trips HBM between conv and norm (the round-4
    bench's residual-bandwidth item). Same formulation as gdn_apply /
    models/layers.py GDN: y / sqrt(beta_min + beta^2 + y^2 @ gamma^2)
    (inverse: multiply)."""
    y = y + b
    if res is not None and add_before_act:
        y = y + res
    if gdn is not None:
        mix = jnp.dot(y * y, gamma2, preferred_element_type=jnp.float32)
        norm = jnp.sqrt(beta_min + beta2 + mix)
        y = y * norm if gdn == "inv" else y / norm
    elif slope is not None:
        s = slope[0] if hasattr(slope, "ndim") else slope
        y = jnp.where(y >= 0, y, s * y)
    if res is not None and not add_before_act:
        y = y + res
    if clip:
        y = jnp.clip(y, 0.0, 1.0)
    return y


def _make_kernel(w_shape, out_w, cout, slope, has_res, add_before_act, clip,
                 TH, acc_dtype=jnp.float32, tap_concat_cin=0, gdn=None):
    """``tap_concat_cin``: when nonzero, the REAL (unpadded) input-channel
    count; the kernel then contracts one [TH*W, kh*kw*cin] @ [kh*kw*cin, Cout]
    matmul instead of kh*kw channel-padded per-tap matmuls. For cin < 128
    that removes the lane-padding waste (9 taps of 64 real channels are 576
    contraction lanes = 4.5 MXU passes, vs 9 passes padded), at the cost of a
    VMEM lane-concat relayout per tile. ``w_v`` is then [kh*kw*cin, Cout]."""
    kh, kw, cin, _ = w_shape
    prelu = slope == "prelu"

    def kernel(x_any, w_v, b_v, *rest):
        if prelu:
            alpha_v, *rest = rest
        gamma2_v = beta2_v = None
        if gdn is not None:
            gamma2_v, beta2_v, *rest = rest
        if has_res:
            res_any, out_any, stripe, rtile, otile, sem_in, sem_res, sem_out = rest
        else:
            out_any, stripe, otile, sem_in, sem_out = rest
            res_any = rtile = sem_res = None
        act = alpha_v[:] if prelu else slope
        n = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def stripe_dma(slot_idx, tile_idx):
            return pltpu.make_async_copy(
                x_any.at[n, pl.ds(tile_idx * TH, TH + kh - 1)],
                stripe.at[slot_idx],
                sem_in.at[slot_idx],
            )

        # Double buffering: the TPU grid runs sequentially, scratch persists
        # across steps. Tile t's stripe was prefetched at step t-1; kick off
        # t+1's DMA before computing t. Each batch row restarts the pipeline.
        @pl.when(t == 0)
        def _():
            stripe_dma(slot, t).start()

        @pl.when(t + 1 < n_tiles)
        def _():
            stripe_dma(nxt, t + 1).start()

        if has_res:
            cp_res = pltpu.make_async_copy(
                res_any.at[n, pl.ds(t * TH, TH)], rtile, sem_res
            )
            cp_res.start()
        stripe_dma(slot, t).wait()

        if tap_concat_cin:
            rc = tap_concat_cin
            parts = [
                stripe[slot, ky : ky + TH, kx : kx + out_w, :rc].reshape(
                    TH * out_w, rc
                )
                for ky in range(kh)
                for kx in range(kw)
            ]
            patch = jnp.concatenate(parts, axis=1)
            acc = jnp.dot(patch, w_v[:], preferred_element_type=acc_dtype)
        else:
            acc = jnp.zeros((TH * out_w, cout), acc_dtype)
            for ky in range(kh):
                for kx in range(kw):
                    # Slice the ref per tap (not one big stripe load): keeps
                    # the value-stack footprint down so TH can stay large.
                    patch = stripe[
                        slot, ky : ky + TH, kx : kx + out_w, :
                    ].reshape(TH * out_w, cin)
                    acc = acc + jnp.dot(
                        patch, w_v[ky, kx], preferred_element_type=acc_dtype
                    )
        res_val = None
        if has_res:
            cp_res.wait()
            res_val = rtile[:].reshape(TH * out_w, cout).astype(acc_dtype)
        y = _epilogue(
            acc, b_v[0], act, res_val, add_before_act, clip,
            gdn=gdn,
            gamma2=gamma2_v[:] if gdn is not None else None,
            beta2=beta2_v[0] if gdn is not None else None,
        )

        # Double-buffered output: wait for this slot's PREVIOUS write (from
        # two steps ago) before overwriting, then fire and forget; the final
        # grid step drains both slots.
        @pl.when(t >= 2)
        def _():
            pltpu.make_async_copy(
                otile.at[slot], out_any.at[n, pl.ds((t - 2) * TH, TH)],
                sem_out.at[slot],
            ).wait()

        otile[slot] = y.reshape(TH, out_w, cout).astype(otile.dtype)
        cp_out = pltpu.make_async_copy(
            otile.at[slot], out_any.at[n, pl.ds(t * TH, TH)], sem_out.at[slot]
        )
        cp_out.start()

        @pl.when(t == n_tiles - 1)
        def _():
            cp_out.wait()

            @pl.when(n_tiles >= 2)
            def _():
                pltpu.make_async_copy(
                    otile.at[nxt], out_any.at[n, pl.ds((t - 1) * TH, TH)],
                    sem_out.at[nxt],
                ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("slope", "add_before_act", "clip", "interpret",
                     "tap_concat", "gdn_inverse"),
)
def conv3x3_valid_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    residual: jnp.ndarray | None = None,
    alpha: jnp.ndarray | None = None,
    gdn_gamma2: jnp.ndarray | None = None,
    gdn_beta2: jnp.ndarray | None = None,
    *,
    slope: float | str | None = 0.2,
    add_before_act: bool = False,
    clip: bool = False,
    interpret: bool = False,
    tap_concat: bool = False,
    gdn_inverse: bool = False,
) -> jnp.ndarray:
    """x [N, H+kh-1, W+kw-1, C] (pre-padded), w [kh,kw,C,Cout], b [Cout]
    -> [N, H, W, Cout] with fused epilogue. H is padded up to a TH multiple
    internally. slope='prelu' uses the per-channel ``alpha`` [Cout] array.
    ``tap_concat``: contract all taps in ONE matmul over kh*kw*C lanes
    (see _make_kernel) — wins when C % 128 != 0 (removes lane-pad waste).
    ``gdn_gamma2``/``gdn_beta2`` ([Cout,Cout] / [Cout] SQUARED params, i.e.
    gamma_sqrt**2 / beta_sqrt**2): fuse (I)GDN into the epilogue instead of
    an activation (``gdn_inverse`` picks IGDN); slope is ignored then."""
    n, hp, wp, cin = x.shape
    kh, kw, _, cout = w.shape
    h = hp - (kh - 1)
    out_w = wp - (kw - 1)
    gran = _sublane_granule(x.dtype.itemsize)
    out_w8 = -(-out_w // gran) * gran
    wp8 = -(-(out_w8 + kw - 1) // gran) * gran
    cin_k = cin + ((-cin) % 128)
    cout_k = cout + ((-cout) % 128)
    TH = _pick_tile_rows(kh, wp8, cin_k, out_w8, cout_k, x.dtype.itemsize,
                         residual is not None)
    h_pad = (-h) % TH
    if h_pad:
        x = jnp.pad(x, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
    h_tiles = (h + h_pad) // TH

    # Mosaic DMA alignment: lane (minor) dims must be 128-aligned and
    # sublane (W) extents 8-aligned. Pad channels and widths with zeros —
    # zero weight rows/cols keep the math identical — and slice back after.
    if wp8 != wp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp8 - wp), (0, 0)))
    if residual is not None and residual.shape[2] != out_w8:
        residual = jnp.pad(
            residual, ((0, 0), (0, 0), (0, out_w8 - residual.shape[2]), (0, 0))
        )
    cin_pad = cin_k - cin
    cout_pad = cout_k - cout
    if cin_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
        if not tap_concat:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad), (0, 0)))
    if cout_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_pad)))
        b = jnp.pad(b, (0, cout_pad))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, 0), (0, 0), (0, cout_pad)))
    has_res = residual is not None
    has_gdn = gdn_gamma2 is not None
    if tap_concat:
        # Rows ordered (ky, kx) row-major, cin-minor — matching the kernel's
        # concat of per-tap slices; a plain reshape of the UNPADDED-cin w.
        w = w.reshape(kh * kw * cin, cout_k)
    kernel = _make_kernel(
        (kh, kw, cin_k, cout_k), out_w8, cout_k, slope, has_res,
        add_before_act, clip, TH,
        tap_concat_cin=cin if tap_concat else 0,
        gdn=("inv" if gdn_inverse else "fwd") if has_gdn else None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x (HBM, manual DMA)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b
    ]
    operands = [x, w, b.reshape(1, cout_k)]
    if slope == "prelu":
        if alpha is None:
            raise ValueError("slope='prelu' requires alpha")
        if cout_pad:
            alpha = jnp.pad(alpha, (0, cout_pad))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(alpha.reshape(1, cout_k))
    if has_gdn:
        # Zero-padded channels: gamma2 pad rows/cols are zero (no mix
        # contribution) and beta2 pads are zero, so padded lanes normalize
        # to 0/sqrt(beta_min) = 0 — sliced off below anyway.
        g2 = gdn_gamma2.astype(jnp.float32)
        b2 = gdn_beta2.astype(jnp.float32)
        if cout_pad:
            g2 = jnp.pad(g2, ((0, cout_pad), (0, cout_pad)))
            b2 = jnp.pad(b2, (0, cout_pad))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(g2)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(b2.reshape(1, cout_k))
    # Scratch order must match the kernel's unpack order exactly:
    # [stripe, (rtile), otile, sem_in, (sem_res), sem_out].
    if has_res:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(residual)
        scratch = [
            pltpu.VMEM((2, TH + kh - 1, wp8, cin_k), x.dtype),  # stripe (2-slot)
            pltpu.VMEM((TH, out_w8, cout_k), x.dtype),          # rtile
            pltpu.VMEM((2, TH, out_w8, cout_k), x.dtype),       # otile (2-slot)
            pltpu.SemaphoreType.DMA((2,)),                       # sem_in
            pltpu.SemaphoreType.DMA,                             # sem_res
            pltpu.SemaphoreType.DMA((2,)),                       # sem_out
        ]
    else:
        scratch = [
            pltpu.VMEM((2, TH + kh - 1, wp8, cin_k), x.dtype),
            pltpu.VMEM((2, TH, out_w8, cout_k), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(n, h_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, h + h_pad, out_w8, cout_k), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
    return out[:, :h, :out_w, :cout]


# ------------------------------------------------------- layer-level wrappers


def _space_to_depth_for_5x5s2(x: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    """Pad for SAME 5x5/s2 and rearrange 2x2 pixel blocks into channels.
    Returns (x4 [N, H_out+2, W_out+2, 4C], h_out, w_out)."""
    n, h, w, c = x.shape
    h_out, w_out = -(-h // 2), -(-w // 2)
    # SAME for k=5,s=2 pads 1 before; stripe must reach row 2*(h_out+1)+1.
    x = jnp.pad(x, ((0, 0), (1, 2 * h_out + 3 - h), (1, 2 * w_out + 3 - w), (0, 0)))
    n_, hp, wp, _ = x.shape
    x = x.reshape(n, hp // 2, 2, wp // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    return x, h_out, w_out


def _weights_5x5s2_to_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """[5,5,C,Cout] -> [3,3,4C,Cout] matching the space-to-depth layout."""
    _, _, c, cout = w.shape
    w3 = jnp.zeros((3, 3, 2, 2, c, cout), w.dtype)
    for a in range(3):
        for dy in range(2):
            if 2 * a + dy > 4:
                continue
            for bq in range(3):
                for dx in range(2):
                    if 2 * bq + dx > 4:
                        continue
                    w3 = w3.at[a, bq, dy, dx].set(w[2 * a + dy, 2 * bq + dx])
    return w3.reshape(3, 3, 4 * c, cout)


def _gdn_sq(gdn):
    """(beta_sqrt [C], gamma_sqrt [C,C]) -> squared VMEM operands."""
    beta_sqrt, gamma_sqrt = gdn
    return gamma_sqrt * gamma_sqrt, beta_sqrt * beta_sqrt


def conv5x5_s2_fused(x, w, b, alpha=None, *, slope=0.2, clip=False,
                     interpret=None, tap_concat=None, gdn=None,
                     gdn_inverse=False):
    """SAME 5x5 stride-2 conv + epilogue via space-to-depth + core kernel.
    ``gdn``: (beta_sqrt, gamma_sqrt) fuses (I)GDN as the epilogue."""
    interpret = _auto_interpret(interpret)
    x4, h_out, w_out = _space_to_depth_for_5x5s2(x)
    w3 = _weights_5x5s2_to_3x3(w)
    g2, b2 = _gdn_sq(gdn) if gdn is not None else (None, None)
    out = conv3x3_valid_fused(
        x4, w3, b, None, alpha, g2, b2,
        slope=slope, clip=clip, interpret=interpret,
        tap_concat=_auto_tap(tap_concat, x4.shape[-1]),
        gdn_inverse=gdn_inverse,
    )
    return out[:, :h_out, :w_out]


def conv3x3_s1_fused(x, w, b, residual=None, alpha=None, *, slope=0.2,
                     add_before_act=False, clip=False, interpret=None,
                     tap_concat=None, gdn=None, gdn_inverse=False):
    """SAME 3x3 stride-1 conv + epilogue (also: SAME 3x3/s1 conv-transpose,
    which is the identical operator)."""
    interpret = _auto_interpret(interpret)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g2, b2 = _gdn_sq(gdn) if gdn is not None else (None, None)
    return conv3x3_valid_fused(
        xp, w, b, residual, alpha, g2, b2,
        slope=slope, add_before_act=add_before_act, clip=clip,
        interpret=interpret, tap_concat=_auto_tap(tap_concat, x.shape[-1]),
        gdn_inverse=gdn_inverse,
    )


def _weights_convT5x5s2_phases(w: jnp.ndarray) -> jnp.ndarray:
    """[5,5,C,Cout] -> [3,3,C,4*Cout] phase kernels.

    lax.conv_transpose(SAME, k=5, s=2) satisfies (verified empirically):
      out[2j+p, 2l+q] = sum_{d,e in -1..1} x[j+d, l+e] * w[2d+3-p, 2e+3-q]
    with out-of-range taps zero. Phase (p,q) output channel block pq."""
    _, _, c, cout = w.shape
    wp = jnp.zeros((3, 3, c, 2, 2, cout), w.dtype)
    for d in range(-1, 2):
        for e in range(-1, 2):
            for p in range(2):
                for q in range(2):
                    iy, ix = 2 * d + 3 - p, 2 * e + 3 - q
                    if 0 <= iy < 5 and 0 <= ix < 5:
                        wp = wp.at[d + 1, e + 1, :, p, q].set(w[iy, ix])
    return wp.reshape(3, 3, c, 4 * cout)


def conv_transpose5x5_s2_fused(x, w, b, alpha=None, *, slope=0.2, clip=False,
                               interpret=None, tap_concat=None, gdn=None,
                               gdn_inverse=False):
    """SAME 5x5 stride-2 conv-transpose + epilogue via phase decomposition.
    x [N,h,w,C] -> [N,2h,2w,Cout]. With ``gdn``, each phase block is its own
    output pixel, so the fused norm uses a block-diagonal gamma (4 copies) —
    channels mix within a pixel, never across phases."""
    interpret = _auto_interpret(interpret)
    n, h, wd, c = x.shape
    cout = w.shape[3]
    wp = _weights_convT5x5s2_phases(w)
    bp = jnp.tile(b, 4)
    ap = jnp.tile(alpha, 4) if alpha is not None else None
    g2 = b2 = None
    if gdn is not None:
        g2s, b2s = _gdn_sq(gdn)
        g2 = jax.scipy.linalg.block_diag(*([g2s] * 4))
        b2 = jnp.tile(b2s, 4)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ph = conv3x3_valid_fused(
        xp, wp, bp, None, ap, g2, b2,
        slope=slope, clip=clip, interpret=interpret,
        tap_concat=_auto_tap(tap_concat, c), gdn_inverse=gdn_inverse,
    )  # [N, h, w, 4*Cout], channel blocks are (p, q)
    ph = ph.reshape(n, h, wd, 2, 2, cout)
    out = ph.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, cout)
    return out


# ----------------------------------------------- full transform (base preset)


def gdn_apply(p, x, inverse=False, beta_min=1e-6):
    """XLA-side (I)GDN between Pallas conv stages — numerically identical to
    models/layers.py GDN (f32 evaluation, same parameterization). The channel
    mix is one [N*H*W, C] x [C, C] matmul that XLA tiles onto the MXU and
    fuses with the surrounding elementwise ops; keeping it outside the conv
    kernels costs one extra HBM round-trip of the stage activation (~5% of
    the stage's ideal traffic) while the conv FLOPs stay on the fused
    kernels."""
    beta_sqrt = p["beta_sqrt"]
    gamma_sqrt = p["gamma_sqrt"]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(
        beta_min
        + beta_sqrt * beta_sqrt
        + jnp.einsum("nhwj,ji->nhwi", xf * xf, gamma_sqrt * gamma_sqrt)
    )
    out = xf * norm if inverse else xf / norm
    return out.astype(x.dtype)


def pallas_analysis_base(params, x, *, slope=0.2, clip=True, interpret=None,
                         tap_concat=None, mask=None, gdn=False):
    """Pallas twin of AnalysisTransform(preset='base').apply — same params
    pytree (flax naming), same outputs to float tolerance.

    ``mask``: optional per-stage callable ``(features, cumulative_stride) ->
    features`` — the spatial-tiling edge mask (parallel/spatial.py), applied
    between kernel calls exactly where the Flax path applies it (masking
    commutes with the fused residual add: both summands carry the same
    keep-pattern at equal stride). ``gdn=True`` uses the (I)GDN activation
    params (``act*_gdn``) via :func:`gdn_apply` between stages — the
    flagship's activation on the Pallas conv path."""
    g = lambda name: (params[name]["kernel"], params[name]["bias"])
    m = mask if mask is not None else (lambda v, s: v)
    kw = dict(interpret=interpret, tap_concat=tap_concat)
    if gdn:
        # (I)GDN fused into each kernel's epilogue (no per-stage HBM
        # round-trip for the normalization; VERDICT r4 item 3). The conv4
        # residual add also rides the kernel (after the norm, matching
        # x = gdn(conv4(x)) + res).
        gp = lambda name: (
            params[name + "_gdn"]["beta_sqrt"],
            params[name + "_gdn"]["gamma_sqrt"],
        )
        x = m(conv5x5_s2_fused(x, *g("conv1"), gdn=gp("act1"), **kw), 2)
        x = m(conv5x5_s2_fused(x, *g("conv2"), gdn=gp("act2"), **kw), 4)
        res = x
        x = m(conv3x3_s1_fused(x, *g("conv3"), gdn=gp("act3"), **kw), 4)
        x = m(
            conv3x3_s1_fused(
                x, *g("conv4"), residual=res, add_before_act=False,
                gdn=gp("act4"), **kw,
            ),
            4,
        )
        x = m(conv5x5_s2_fused(x, *g("conv8"), slope=None, clip=clip, **kw), 8)
        return x
    x = m(conv5x5_s2_fused(x, *g("conv1"), slope=slope, **kw), 2)
    x = m(conv5x5_s2_fused(x, *g("conv2"), slope=slope, **kw), 4)
    res = x
    x = m(conv3x3_s1_fused(x, *g("conv3"), slope=slope, **kw), 4)
    # conv4: act then add residual (reference order: x = act(conv4(x)) + res)
    x = m(
        conv3x3_s1_fused(
            x, *g("conv4"), residual=res, slope=slope, add_before_act=False,
            **kw,
        ),
        4,
    )
    x = m(conv5x5_s2_fused(x, *g("conv8"), slope=slope, clip=clip, **kw), 8)
    return x


def pallas_synthesis_base(params, x, *, slope=0.2, clip=True, interpret=None,
                          tap_concat=None, mask=None, gdn=False):
    """Pallas twin of SynthesisTransform(preset='base').apply. ``mask`` and
    ``gdn`` as in :func:`pallas_analysis_base` (synthesis uses IGDN)."""
    g = lambda name: (params[name]["kernel"], params[name]["bias"])
    m = mask if mask is not None else (lambda v, s: v)
    kw = dict(interpret=interpret, tap_concat=tap_concat)
    if gdn:
        gp = lambda name: (
            params[name + "_gdn"]["beta_sqrt"],
            params[name + "_gdn"]["gamma_sqrt"],
        )
        igdn = dict(gdn_inverse=True)
        x = m(conv_transpose5x5_s2_fused(x, *g("dconv1"), gdn=gp("act1"), **igdn, **kw), 2)
        res = x
        x = m(conv3x3_s1_fused(x, *g("dconv5"), gdn=gp("act5"), **igdn, **kw), 2)
        x = m(
            conv3x3_s1_fused(
                x, *g("dconv6"), residual=res, add_before_act=False,
                gdn=gp("act6"), **igdn, **kw,
            ),
            2,
        )
        x = m(conv_transpose5x5_s2_fused(x, *g("dconv7"), gdn=gp("act7"), **igdn, **kw), 4)
        x = m(
            conv_transpose5x5_s2_fused(
                x, *g("dconv8"), slope=None, clip=clip, **kw
            ),
            8,
        )
        return x
    x = m(conv_transpose5x5_s2_fused(x, *g("dconv1"), slope=slope, **kw), 2)
    res = x
    x = m(conv3x3_s1_fused(x, *g("dconv5"), slope=slope, **kw), 2)
    x = m(
        conv3x3_s1_fused(
            x, *g("dconv6"), residual=res, slope=slope, add_before_act=False,
            **kw,
        ),
        2,
    )
    x = m(conv_transpose5x5_s2_fused(x, *g("dconv7"), slope=slope, **kw), 4)
    x = m(
        conv_transpose5x5_s2_fused(
            x, *g("dconv8"), slope=slope, clip=clip, **kw
        ),
        8,
    )
    return x


# ----------------------------------------------- full transform (deep preset)


def pallas_analysis_deep(params, x, *, clip=True, interpret=None,
                         tap_concat=None, mask=None):
    """Pallas twin of AnalysisTransform(preset='deep') — the tf1_13 topology
    (reference tf1_13/src/utils.py:39-58): 16x downsample, PReLU activations,
    residual stages fused as conv+add-before-PReLU epilogues. ``mask`` as in
    :func:`pallas_analysis_base` (applied after every fused activation site,
    matching the Flax path's per-stage placement)."""
    g = lambda name: (params[name]["kernel"], params[name]["bias"])
    a = lambda name: params[name]["alpha"]
    m = mask if mask is not None else (lambda v, s: v)
    k = dict(slope="prelu", interpret=interpret, tap_concat=tap_concat)
    x = m(conv5x5_s2_fused(x, *g("conv1"), a("act1"), **k), 2)
    x = m(conv5x5_s2_fused(x, *g("conv2"), a("act2"), **k), 4)
    res = m(conv3x3_s1_fused(x, *g("conv3"), None, a("act3"), **k), 4)
    x = m(conv3x3_s1_fused(res, *g("conv4"), x, a("act4"), add_before_act=True, **k), 4)
    x = m(conv5x5_s2_fused(x, *g("conv5"), a("act5"), **k), 8)
    res = m(conv3x3_s1_fused(x, *g("conv6"), None, a("act6"), **k), 8)
    x = m(conv3x3_s1_fused(res, *g("conv7"), x, a("act7"), add_before_act=True, **k), 8)
    x = m(conv5x5_s2_fused(x, *g("conv8"), a("act8"), clip=clip, **k), 16)
    return x


def pallas_synthesis_deep(params, x, *, clip=True, interpret=None,
                          tap_concat=None, mask=None):
    """Pallas twin of SynthesisTransform(preset='deep')
    (reference tf1_13/src/utils.py:60-79). Residual stages use regular convs
    between the transposed-conv upsamples, as in the reference."""
    g = lambda name: (params[name]["kernel"], params[name]["bias"])
    a = lambda name: params[name]["alpha"]
    m = mask if mask is not None else (lambda v, s: v)
    k = dict(slope="prelu", interpret=interpret, tap_concat=tap_concat)
    x = m(conv_transpose5x5_s2_fused(x, *g("dconv1"), a("act1"), **k), 2)
    res = m(conv3x3_s1_fused(x, *g("dconv2"), None, a("act2"), **k), 2)
    x = m(conv3x3_s1_fused(res, *g("dconv3"), x, a("act3"), add_before_act=True, **k), 2)
    x = m(conv_transpose5x5_s2_fused(x, *g("dconv4"), a("act4"), **k), 4)
    res = m(conv3x3_s1_fused(x, *g("dconv5"), None, a("act5"), **k), 4)
    x = m(conv3x3_s1_fused(res, *g("dconv6"), x, a("act6"), add_before_act=True, **k), 4)
    x = m(conv_transpose5x5_s2_fused(x, *g("dconv7"), a("act7"), **k), 8)
    x = m(conv_transpose5x5_s2_fused(x, *g("dconv8"), a("act8"), clip=clip, **k), 16)
    return x

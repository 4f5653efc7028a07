"""Deterministic fixed-point inference for the coding-side context nets.

Why this exists: the two-pass checkerboard and hyperprior bitstreams require
the encoder and decoder to agree EXACTLY on the conditional Gaussian
parameters (round(mean) and the scale-table bin of every position). The
training-time nets are float convolutions, and float conv results differ
across XLA backends (TPU vs CPU vs GPU), so a container encoded on one
platform could silently fail to decode on another (the container CRC,
coding/container.py, turns that into a loud error — this module removes the
error). The reference never faces this problem because its "entropy coder"
is a PNG file (reference tf2_0/src/utils.py:42-43,85-87).

Approach: quantize the context-net weights to fixed point and run the whole
inference in EXACT integer arithmetic. Integers are carried in float64
arrays: every value in every intermediate is an integer of magnitude below
2**52, so IEEE-754 guarantees each multiply/add is exact regardless of
summation order, FMA use, or BLAS blocking — np.dot runs at dgemm speed and
is still bit-deterministic on every platform. Overflow guards raise before
any operation could round.

Determinism inventory (what each side computes, and why it matches):
  - weight quantization    rint(w * 2**FW): one IEEE multiply + rint — exact
  - input lookup tables    built from divisions by powers of two (the span
                           constants 16/128 are powers of two; the unit grid
                           divides by L-1 with one correctly-rounded IEEE op)
  - convolutions           exact integer dgemm (see above)
  - leaky_relu(0.2)        x<0 -> floor(x * 13107 / 65536): exact
  - mean rounding          floor(center + off*span/2**FA + 0.5): exact
                           (span is a power of two or 255/2 — both exact)
  - scale -> CDF bin       integer comparison against precomputed thresholds
What still involves float transcendentals — and why that is safe:
  - the one-time scale-threshold table (log/expm1 here) and the static
    Gaussian scale-CDF rows (exp/erf in coding/cdf.py). Both are derived on
    the HOST (numpy/CPython float64) from static config only — never through
    JAX — so they are identical for a TPU-backend encoder and a CPU-backend
    decoder on any one machine. Across machines with different libm builds a
    last-ulp difference is theoretically possible but only matters if a
    value lands within ~1e-12 of a bin/quantization boundary; the container
    CRC remains as the backstop for that astronomically unlikely case.
  - the factorized (anchor / hyper-z) CDF tables are JAX float evaluations
    and genuinely DO drift across backends — det containers therefore never
    use them: codec_stream.compress_symbols force-embeds exact per-image
    histogram tables (pure numpy) for every factorized-coded stream, so
    decode rebuilds nothing through JAX (ADVICE r2 fix).

Rate cost: the quantized net is a (deterministically) perturbed version of
the trained float net, so predicted means/scales shift by ~2**-FA and the
streams grow by a fraction of a percent (tests/test_detnet.py bounds it).
"""
from __future__ import annotations

import numpy as np

FA = 14  # fraction bits of activations
FW = 14  # fraction bits of weights
_LEAKY_NUM = 13107.0  # round(0.2 * 2**16): leaky_relu slope in fixed point
_LEAKY_DEN = 65536.0
_SAFE_BITS = 52  # all intermediates must stay below 2**_SAFE_BITS


class DetOverflowError(OverflowError):
    """Fixed-point range exceeded; results would stop being exact."""


def _quantize_conv(layer_params) -> tuple[np.ndarray, np.ndarray]:
    """Flax conv params -> (kernel at FW, bias at FA) as integer float64."""
    k = np.rint(np.asarray(layer_params["kernel"], np.float64) * (2.0 ** FW))
    b = np.rint(np.asarray(layer_params["bias"], np.float64) * (2.0 ** FA))
    return k, b


def _guard(x: np.ndarray, k: np.ndarray, taps: int) -> None:
    xm = float(np.abs(x).max(initial=0.0))
    km = float(np.abs(k).max(initial=0.0))
    if xm * km * taps >= 2.0 ** _SAFE_BITS:
        raise DetOverflowError(
            f"fixed-point accumulator bound {xm * km * taps:.3g} >= 2**{_SAFE_BITS}"
        )


def _conv_valid(xp: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Exact integer VALID correlation. xp [H,W,cin], k [kh,kw,cin,cout]."""
    kh, kw, cin, cout = k.shape
    _guard(xp, k, kh * kw * cin)
    win = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(0, 1))
    oh, ow = win.shape[:2]
    # win: [oh, ow, cin, kh, kw] -> [oh*ow, kh*kw*cin] matching k's layout
    cols = np.ascontiguousarray(win.transpose(0, 1, 3, 4, 2)).reshape(
        oh * ow, kh * kw * cin
    )
    out = cols @ k.reshape(kh * kw * cin, cout)
    return out.reshape(oh, ow, cout)


def conv_same_fixed(x: np.ndarray, k: np.ndarray, b: np.ndarray) -> np.ndarray:
    """SAME stride-1 conv on FA fixed-point input; returns FA fixed point."""
    kh, kw = k.shape[:2]
    xp = np.pad(x, ((kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    acc = _conv_valid(xp, k)  # at FA + FW
    return np.floor(acc / (2.0 ** FW)) + b


def conv_transpose_s2_fixed(x: np.ndarray, k: np.ndarray,
                            b: np.ndarray) -> np.ndarray:
    """Flax ConvTranspose(SAME, stride 2, odd k) twin: input dilation 2 +
    asymmetric pad (k-2, k-3) + unflipped VALID correlation (geometry
    verified against flax.linen.ConvTranspose; output is [2h, 2w])."""
    kh, kw = k.shape[:2]
    if (kh, kw) != (5, 5):
        raise NotImplementedError(
            "pad geometry derived (and verified vs flax) for 5x5 stride-2 only"
        )
    h, w, cin = x.shape
    xd = np.zeros((2 * h - 1, 2 * w - 1, cin), np.float64)
    xd[::2, ::2] = x
    xp = np.pad(xd, ((kh - 2, kh - 3), (kw - 2, kw - 3), (0, 0)))
    acc = _conv_valid(xp, k)
    return np.floor(acc / (2.0 ** FW)) + b


def leaky_fixed(x: np.ndarray) -> np.ndarray:
    """leaky_relu with slope 13107/65536 (~0.2), exact on FA fixed point."""
    return np.where(x >= 0, x, np.floor(x * _LEAKY_NUM / _LEAKY_DEN))


def _softplus_inv64(y: np.ndarray) -> np.ndarray:
    return np.log(np.expm1(np.asarray(y, np.float64)))


def _scale_thresholds(codec) -> np.ndarray:
    """Fixed-point raw-scale thresholds of the static scale table.

    The float path computes idx = searchsorted(scale_table,
    clip(softplus(raw + softplus_inv(scale_init)), smin, smax), 'left');
    softplus is monotone, so on the raw axis the bin boundaries are
    softplus_inv(s_i) - softplus_inv(scale_init), scaled to FA fixed point.
    Clipping is absorbed by the searchsorted saturation at both ends."""
    from neural_network_image_compression_tpu.coding import cdf as cdf_mod

    e = codec.cfg.entropy
    table = cdf_mod.make_scale_table(e.scale_bins, e.scale_min, e.scale_max)
    c = _softplus_inv64(np.float64(codec._ctx_scale_init))
    return (_softplus_inv64(table) - c) * (2.0 ** FA)


def _symbol_lut(codec) -> np.ndarray:
    """levels-entry lookup: symbol value -> FA fixed-point context-net input
    (the codec's _context_input normalization, models/codec.py)."""
    s = np.arange(codec.levels, dtype=np.float64)
    if codec.grid == "integer":
        v = (s - codec.levels // 2) / codec._density_span  # span: power of 2
    else:
        v = (s / (codec.levels - 1) - 0.5) * 2.0
    return np.rint(v * (2.0 ** FA))


def _hyper_lut(codec) -> np.ndarray:
    """levels-entry lookup: hyper symbol -> FA fixed-point hyper-decoder
    input ((z - L//2) / z_span with z_span = density span, a power of 2)."""
    s = np.arange(codec.levels, dtype=np.float64)
    v = (s - codec.levels // 2) / codec._density_span
    return np.rint(v * (2.0 ** FA))


def _mean_mu(mean_off_fixed: np.ndarray, span: float, levels: int) -> np.ndarray:
    """FA fixed-point mean head -> integer symbol mean in [0, levels).

    mean = center + off*span with center = (levels-1)/2; round-half-up then
    wrap. span is 16/128 (power of two) or 127.5 (= 255/2): off*span stays an
    exact float64 multiple of 2**-(FA+1), so every step below is exact."""
    center = (levels - 1) / 2.0
    mean = center + mean_off_fixed * (span / (2.0 ** FA))
    return np.floor(mean + 0.5).astype(np.int64) % levels


def _scale_idx(raw_fixed: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(thresholds, raw_fixed, side="left")
    return np.minimum(idx, len(thresholds) - 1).astype(np.int32)


# --------------------------------------------------------------- net drivers


def _det_cache(codec, params, key: str, build):
    """Per-(codec, params) cache of quantized tables. params is keyed by
    identity — a new checkpoint tree gets fresh tables."""
    store = getattr(codec, "_det_tables", None)
    if store is None or store[0] is not params:
        store = (params, {})
        codec._det_tables = store
    if key not in store[1]:
        store[1][key] = build()
    return store[1][key]


def _ctx_layers(codec, params, which: str):
    tree = params[f"context_{which}"]
    return [_quantize_conv(tree[n]) for n in ("ctx1", "ctx2", "ctx3")]


def _hyper_layers(codec, params, which: str):
    tree = params[f"hyper_dec_{which}"]
    return [_quantize_conv(tree[n]) for n in ("hd1", "hd2", "hd3")]


def _run_ctx(x: np.ndarray, layers) -> np.ndarray:
    x = leaky_fixed(conv_same_fixed(x, *layers[0]))
    x = leaky_fixed(conv_same_fixed(x, *layers[1]))
    return conv_same_fixed(x, *layers[2])


def _run_hyper(x: np.ndarray, layers, out_hw) -> np.ndarray:
    x = leaky_fixed(conv_transpose_s2_fixed(x, *layers[0]))
    x = leaky_fixed(conv_transpose_s2_fixed(x, *layers[1]))
    x = x[: out_hw[0], : out_hw[1], :]
    return conv_same_fixed(x, *layers[2])


def det_context_params(codec, params,
                       sym: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic twin of codec_stream._ctx_fn for the coding path.

    sym: [h,w,3C] uint8 full-grid symbols (non-anchor values are ignored —
    the net input is masked to anchors, exactly like the float path).
    Returns full-grid (mu [h,w,3C] int64 in [0,levels), idx [h,w,3C] int32).
    """
    cch = codec.latent_channels
    levels = codec.levels
    h, w = sym.shape[:2]
    lut = _det_cache(codec, params, "ctx_lut", lambda: _symbol_lut(codec))
    thr = _det_cache(codec, params, "thr", lambda: _scale_thresholds(codec))
    ly = _det_cache(codec, params, "ctx_y", lambda: _ctx_layers(codec, params, "y"))
    lc = _det_cache(codec, params, "ctx_c", lambda: _ctx_layers(codec, params, "c"))
    amask = ((np.add.outer(np.arange(h), np.arange(w)) % 2) == 0)[..., None]
    x = lut[sym] * amask  # FA fixed point, anchors only
    span = codec._ctx_mean_span
    mu = np.empty((h, w, 3 * cch), np.int64)
    idx = np.empty((h, w, 3 * cch), np.int32)
    for p, layers in ((0, ly), (1, lc), (2, lc)):
        out = _run_ctx(x[..., p * cch : (p + 1) * cch], layers)
        mu[..., p * cch : (p + 1) * cch] = _mean_mu(out[..., :cch], span, levels)
        idx[..., p * cch : (p + 1) * cch] = _scale_idx(out[..., cch:], thr)
    return mu, idx


def det_joint_hyper(codec, params, z_sym: np.ndarray,
                    out_hw: tuple[int, int]):
    """Deterministic stage 1 of the joint (hyperprior + checkerboard) coding
    path: DECODED hyper symbols -> (mu_h, idx_h) for the anchor streams plus
    the FA fixed-point raw head features [h,w,3*2C] that stage 2's context
    net conditions on (the det analogue of HyperDecoder.raw)."""
    cch = codec.latent_channels
    zc = codec.cfg.entropy.hyper_channels
    levels = codec.levels
    lut = _det_cache(codec, params, "hyper_lut", lambda: _hyper_lut(codec))
    thr = _det_cache(codec, params, "thr", lambda: _scale_thresholds(codec))
    ly = _det_cache(codec, params, "hyp_y", lambda: _hyper_layers(codec, params, "y"))
    lc = _det_cache(codec, params, "hyp_c", lambda: _hyper_layers(codec, params, "c"))
    x = lut[z_sym]
    span = codec._ctx_mean_span
    h, w = out_hw
    mu = np.empty((h, w, 3 * cch), np.int64)
    idx = np.empty((h, w, 3 * cch), np.int32)
    raw = np.empty((h, w, 3 * 2 * cch), np.float64)
    for p, layers in ((0, ly), (1, lc), (2, lc)):
        out = _run_hyper(x[..., p * zc : (p + 1) * zc], layers, out_hw)
        mu[..., p * cch : (p + 1) * cch] = _mean_mu(out[..., :cch], span, levels)
        idx[..., p * cch : (p + 1) * cch] = _scale_idx(out[..., cch:], thr)
        raw[..., p * 2 * cch : (p + 1) * 2 * cch] = out
    return mu, idx, raw


def det_joint_ctx(codec, params, sym: np.ndarray,
                  raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stage 2 of the joint coding path: full-grid symbols
    (only anchor positions are read — masked like the float path) plus the
    stage-1 raw hyper features -> (mu_j, idx_j) for the non-anchor streams.

    The float path feeds the context net concat([masked normalized anchors,
    raw hyper features]); here both halves are already FA fixed point (symbol
    LUT; stage-1 conv output), so the concatenated input is exact."""
    cch = codec.latent_channels
    levels = codec.levels
    h, w = sym.shape[:2]
    lut = _det_cache(codec, params, "ctx_lut", lambda: _symbol_lut(codec))
    thr = _det_cache(codec, params, "thr", lambda: _scale_thresholds(codec))
    ly = _det_cache(codec, params, "ctx_y", lambda: _ctx_layers(codec, params, "y"))
    lc = _det_cache(codec, params, "ctx_c", lambda: _ctx_layers(codec, params, "c"))
    amask = ((np.add.outer(np.arange(h), np.arange(w)) % 2) == 0)[..., None]
    anchors = lut[sym] * amask
    span = codec._ctx_mean_span
    mu = np.empty((h, w, 3 * cch), np.int64)
    idx = np.empty((h, w, 3 * cch), np.int32)
    for p, layers in ((0, ly), (1, lc), (2, lc)):
        x = np.concatenate(
            [
                anchors[..., p * cch : (p + 1) * cch],
                raw[..., p * 2 * cch : (p + 1) * 2 * cch],
            ],
            axis=-1,
        )
        out = _run_ctx(x, layers)
        mu[..., p * cch : (p + 1) * cch] = _mean_mu(out[..., :cch], span, levels)
        idx[..., p * cch : (p + 1) * cch] = _scale_idx(out[..., cch:], thr)
    return mu, idx


def det_hyper_conditional(codec, params, z_sym: np.ndarray,
                          out_hw: tuple[int, int]) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic twin of codec_stream._hyper_fns' cond for the coding
    path. z_sym: [zh,zw,3Zc] uint8 DECODED hyper symbols. Returns full-grid
    (mu, idx) for the main latent, like :func:`det_context_params`."""
    cch = codec.latent_channels
    zc = codec.cfg.entropy.hyper_channels
    levels = codec.levels
    lut = _det_cache(codec, params, "hyper_lut", lambda: _hyper_lut(codec))
    thr = _det_cache(codec, params, "thr", lambda: _scale_thresholds(codec))
    ly = _det_cache(codec, params, "hyp_y", lambda: _hyper_layers(codec, params, "y"))
    lc = _det_cache(codec, params, "hyp_c", lambda: _hyper_layers(codec, params, "c"))
    x = lut[z_sym]
    span = codec._ctx_mean_span
    h, w = out_hw
    mu = np.empty((h, w, 3 * cch), np.int64)
    idx = np.empty((h, w, 3 * cch), np.int32)
    for p, layers in ((0, ly), (1, lc), (2, lc)):
        out = _run_hyper(x[..., p * zc : (p + 1) * zc], layers, out_hw)
        mu[..., p * cch : (p + 1) * cch] = _mean_mu(out[..., :cch], span, levels)
        idx[..., p * cch : (p + 1) * cch] = _scale_idx(out[..., cch:], thr)
    return mu, idx


def _chan_layers(codec, params, which: str, s: int):
    tree = params[f"context_{which}"]
    return [_quantize_conv(tree[f"cc{s}_{i}"]) for i in (1, 2, 3)]


def det_channel_params(codec, params, sym: np.ndarray,
                       only_slice: int | None = None
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic twin of codec_stream._chan_fn (channel-wise context).

    sym: [h,w,3C] uint8 symbols; slice s's stack reads only channels
    [: s*width] of its plane, so values in not-yet-decoded channels are
    ignored exactly as in the float path. Returns (mu, idx), each
    [h,w,3*(C - width)] matching the float path's plane-major layout of the
    conditional channels [width:] — or [h,w,3*width] for just
    ``only_slice`` (the progressive decoder's per-pass call)."""
    cch = codec.latent_channels
    levels = codec.levels
    h, w = sym.shape[:2]
    n_slices = codec.context_y.num_slices
    width = cch // n_slices
    slices = (only_slice,) if only_slice is not None else tuple(
        range(1, n_slices)
    )
    cw = width * len(slices)
    lut = _det_cache(codec, params, "chan_lut", lambda: _symbol_lut(codec))
    thr = _det_cache(codec, params, "thr", lambda: _scale_thresholds(codec))
    span = codec._ctx_mean_span
    x = lut[sym]
    mu = np.empty((h, w, 3 * cw), np.int64)
    idx = np.empty((h, w, 3 * cw), np.int32)
    for p, which in ((0, "y"), (1, "c"), (2, "c")):
        xp = x[..., p * cch : (p + 1) * cch]
        for j, s in enumerate(slices):
            layers = _det_cache(
                codec, params, f"chan_{which}_{s}",
                lambda which=which, s=s: _chan_layers(codec, params, which, s),
            )
            out = _run_ctx(xp[..., : s * width], layers)
            lo = p * cw + j * width
            mu[..., lo : lo + width] = _mean_mu(out[..., :width], span, levels)
            idx[..., lo : lo + width] = _scale_idx(out[..., width:], thr)
    return mu, idx

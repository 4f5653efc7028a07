"""Image quality metrics in pure JAX: PSNR, SSIM, MS-SSIM.

Definitions match the metrics the reference relies on from TF
(``tf.image.ssim`` / ``tf.image.ssim_multiscale``; used at reference
tf2_0/src/training.py:108-117 for the training loss and
tf1_13/tests/calc_ssim.py:13 for evaluation): 11x11 Gaussian window with
sigma 1.5, k1=0.01, k2=0.03, VALID windowing, and the standard 5-scale
MS-SSIM power factors with symmetric-padded 2x2 average-pool downsampling.

All metrics are differentiable, batched over the leading axis, and reduce over
spatial+channel dims per image — so they can serve as both the training
distortion term and the evaluation comparator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MS_SSIM_POWER_FACTORS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio per image. a, b: [N,H,W,C]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


def _gaussian_window(filter_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable depthwise VALID convolution with a 1D window along H then W.

    precision=HIGHEST: on TPU the default conv precision rounds through
    bfloat16, which makes the moment estimates E[x^2] - mu^2 go negative by
    more than the c2 stabilizer on near-constant planes (chroma!), flipping
    the SSIM denominator sign -> inf. These blurs are a negligible share of
    the step's FLOPs, so full precision costs nothing measurable."""
    c = x.shape[-1]
    k = win.shape[0]
    wh = jnp.asarray(win).reshape(k, 1, 1, 1) * jnp.ones((1, 1, 1, c), jnp.float32)
    ww = jnp.asarray(win).reshape(1, k, 1, 1) * jnp.ones((1, 1, 1, c), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, wh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, c), ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, ww, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def _ssim_lcs(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float,
    filter_size: int,
    filter_sigma: float,
    k1: float,
    k2: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel luminance and contrast-structure maps (VALID windows)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    win = _gaussian_window(filter_size, filter_sigma)

    mu_a = _depthwise_blur(a, win)
    mu_b = _depthwise_blur(b, win)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    # Clamp the variance estimates: they are mathematically >= 0 but float
    # rounding can dip them negative, and the denominators must stay > 0.
    sigma_aa = jnp.maximum(_depthwise_blur(a * a, win) - mu_aa, 0.0)
    sigma_bb = jnp.maximum(_depthwise_blur(b * b, win) - mu_bb, 0.0)
    sigma_ab = _depthwise_blur(a * b, win) - mu_ab

    luminance = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    return luminance, cs


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM per image, averaged over windows and channels. a, b: [N,H,W,C]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    luminance, cs = _ssim_lcs(a, b, max_val, filter_size, filter_sigma, k1, k2)
    return jnp.mean(luminance * cs, axis=(1, 2, 3))


def _avg_pool_2x2_symmetric(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool with symmetric padding to even dims
    (the MS-SSIM downsampling step)."""
    n, h, w, c = x.shape
    pad_h = h % 2
    pad_w = w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="symmetric")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    power_factors: tuple = _MS_SSIM_POWER_FACTORS,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Multi-scale SSIM per image. a, b: [N,H,W,C].

    The full 5-scale stack needs min(H, W) >= filter_size * 2**4 = 176 px
    (the TF implementation the reference calls, tf1_13/tests/calc_ssim.py:13,
    returns NaN below that); scales that would shrink a side under
    ``filter_size`` are auto-truncated instead — small images (e.g. the
    128x128 held-out patch set) degrade gracefully toward single-scale SSIM
    rather than NaN, matching the trainer's loss behaviour
    (training/train_step.py _distortion).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    usable = 1
    min_hw = min(a.shape[1], a.shape[2])
    while usable < len(power_factors) and min_hw // (2 ** usable) >= filter_size:
        usable += 1
    power_factors = power_factors[:usable]
    n_scales = len(power_factors)
    mcs_or_ssim = []
    for scale in range(n_scales):
        luminance, cs = _ssim_lcs(a, b, max_val, filter_size, filter_sigma, k1, k2)
        if scale == n_scales - 1:
            value = jnp.mean(luminance * cs, axis=(1, 2, 3))
        else:
            value = jnp.mean(cs, axis=(1, 2, 3))
            a = _avg_pool_2x2_symmetric(a)
            b = _avg_pool_2x2_symmetric(b)
        mcs_or_ssim.append(jax.nn.relu(value))
    result = jnp.ones_like(mcs_or_ssim[0])
    for value, weight in zip(mcs_or_ssim, power_factors):
        result = result * value**weight
    return result

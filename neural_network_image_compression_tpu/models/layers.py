"""Shared layers for the codec transforms.

TPU notes: all convs are NHWC and map onto XLA convolution, which tiles onto
the MXU; activations fuse into the conv epilogue. ``compute_dtype='bfloat16'``
casts inputs/params for the conv compute while keeping parameter storage (and
the numerically sensitive clip/quantize boundary) in float32.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """Per-channel parametric ReLU, alpha initialised to ``init`` —
    the reference tf1_13 activation (tf1_13/src/utils.py:17-25)."""

    init: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init), (x.shape[-1],), jnp.float32
        )
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class GDN(nn.Module):
    """Generalized divisive normalization (Balle, Laparra & Simoncelli 2016):

        y_i = x_i / sqrt(beta_i + sum_j gamma_ij * x_j^2)        (analysis)
        y_i = x_i * sqrt(beta_i + sum_j gamma_ij * x_j^2)        (synthesis,
                                                                  ``inverse=True``)

    The activation the reference's thesis-era topologies predate; offered as
    ``model.activation='gdn'`` because it is the single highest-leverage R-D
    upgrade for conv compression autoencoders (it Gaussianizes the latent the
    factorized/conditional entropy models then code). No reference analogue —
    the reference uses leaky_relu (tf2_0/src/encoder.py:10-17) / PReLU
    (tf1_13/src/utils.py:17-25), both kept as presets.

    TPU notes: the channel mix ``sum_j gamma_ij x_j^2`` is a 1x1 conv — an
    [N*H*W, C] x [C, C] matmul that XLA tiles onto the MXU and fuses with the
    surrounding elementwise ops. Evaluated in float32 regardless of the conv
    compute dtype (the rsqrt is numerically sensitive and the op is a few % of
    transform FLOPs). Nonnegativity of beta/gamma is by construction (stored
    as square roots); the off-diagonal sqrt-params initialise at a small
    positive value instead of 0 so their gradient is nonzero from step 1.
    Pointwise across space, so spatial-tiling edge masks commute with it
    (GDN(0) == 0) and the halo-exchange path needs no changes.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    gamma_offdiag_sqrt_init: float = 1e-2
    # 'float32' (default): the norm is evaluated in f32 regardless of the
    # conv compute dtype — numerically safest, costs two casts per site in
    # bf16 pipelines. 'compute': evaluate in the input dtype (bf16 on TPU)
    # with f32 accumulation in the channel-mix matmul — removes the cast
    # round-trips on the serving path (model.gdn_dtype knob).
    compute: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        beta_sqrt = self.param(
            "beta_sqrt", nn.initializers.ones, (c,), jnp.float32
        )

        def _gamma_init(key, shape, dtype=jnp.float32):
            del key
            eye = jnp.eye(c, dtype=dtype)
            return eye * (self.gamma_init ** 0.5) + (1.0 - eye) * (
                self.gamma_offdiag_sqrt_init
            )

        gamma_sqrt = self.param("gamma_sqrt", _gamma_init, (c, c), jnp.float32)
        if self.compute == "float32":
            xf = x.astype(jnp.float32)
            norm = jnp.sqrt(
                self.beta_min
                + beta_sqrt * beta_sqrt
                + jnp.einsum("nhwj,ji->nhwi", xf * xf, gamma_sqrt * gamma_sqrt)
            )
            out = xf * norm if self.inverse else xf / norm
            return out.astype(x.dtype)
        # 'compute' mode: stay in the input dtype; the matmul accumulates in
        # f32 (preferred_element_type) and only the rsqrt runs per element.
        g = (gamma_sqrt * gamma_sqrt).astype(x.dtype)
        mix = jnp.einsum(
            "nhwj,ji->nhwi", x * x, g, preferred_element_type=jnp.float32
        )
        norm = jnp.sqrt(
            self.beta_min + (beta_sqrt * beta_sqrt) + mix
        ).astype(x.dtype)
        return x * norm if self.inverse else x / norm


def make_activation(kind: str, slope: float = 0.2, prelu_init: float = 0.2):
    """Activation factory. 'leaky_relu' matches TF's default alpha=0.2
    (used throughout reference tf2_0/src/encoder.py:10-17); 'prelu' matches
    tf1_13. Returns a callable applied post-conv."""
    if kind == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if kind == "prelu":
        return PReLU(init=prelu_init)
    if kind == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {kind!r}")


def _subpixel_taps(k: int) -> tuple[dict, int, int]:
    """Phase decomposition of a stride-2 SAME transposed conv with odd
    kernel ``k`` (jax pad rule: pad_a=(k+1)//2, pad_b=(k-1)//2).

    Output index t=2i+p reads dilated-input index d = 2i+p+u-(m+1) for
    kernel tap u, which is a real input sample x[i+offset] only when d is
    even, i.e. u has parity (m+1-p) mod 2 and offset=(p+u-m-1)//2. Returns
    {phase p: [(offset, u), ...]} plus the global (min, max) offset.
    """
    m = (k - 1) // 2
    taps = {}
    offs = []
    for p in (0, 1):
        tp = []
        for u in range(k):
            if (p + u - m - 1) % 2 == 0:
                o = (p + u - m - 1) // 2
                tp.append((o, u))
                offs.append(o)
        taps[p] = tp
    return taps, min(offs), max(offs)


class SubpixelConvTranspose(nn.Module):
    """Stride-2 SAME transposed conv, computed the MXU-friendly way.

    ``nn.ConvTranspose`` lowers to an input-dilated conv: the full kxk
    kernel slides over a zero-stuffed input at OUTPUT resolution, so 3/4 of
    the multiply-accumulates hit structural zeros and the conv grid is 4x
    larger than the information content. On TPU this made the synthesis
    transform 1.7x slower than the analysis transform (stage probe,
    RESULTS.md round 4).

    This module is bit-compatible in parameters (same ``kernel`` HWIO
    (k,k,cin,cout) and ``bias`` names/shapes as ``nn.ConvTranspose``, so
    checkpoints are drop-in) and mathematically identical in output: the
    kernel is sliced into the 4 output phases (even/odd row x even/odd
    col — the taps that can ever touch a real sample for that phase), the
    slices run as ONE stride-1 conv at LOW resolution producing 4*cout
    channels, and a depth-to-space interleave writes the phases back. Same
    result, ~4x fewer MACs, no zero-stuffed intermediate in HBM.
    """

    features: int
    kernel_size: int  # odd
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        k = self.kernel_size
        if k % 2 == 0:
            raise ValueError("SubpixelConvTranspose requires an odd kernel")
        if k < 3:
            # k=1 passes the odd-kernel guard but the phase decomposition
            # assumes jax's SAME conv-transpose padding pad_a=(k+1)//2, which
            # only holds for stride <= k-1; at k=1 jax pads pad_a=k-1=0 and
            # the phases land shifted (measured max|diff| ~4 vs
            # nn.ConvTranspose). Refuse rather than silently diverge
            # (ADVICE r4).
            raise ValueError(
                "SubpixelConvTranspose requires kernel_size >= 3: the "
                "stride-2 SAME phase decomposition does not match jax's "
                "pad rule when stride > kernel_size - 1"
            )
        cin, cout = x.shape[-1], self.features
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin, cout),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros_init(), (cout,), jnp.float32)

        taps, omin, omax = _subpixel_taps(k)
        kk = omax - omin + 1
        # K[du, dv, ci, (p*2+q)*cout+co] = w[u, v, ci, co] for the phase's
        # valid taps; other positions stay zero. Built at trace time from
        # the live param (a handful of gathers, fused by XLA).
        K = jnp.zeros((kk, kk, cin, 4 * cout), w.dtype)
        for p in (0, 1):
            for q in (0, 1):
                ph = p * 2 + q
                for (ou, u) in taps[p]:
                    for (ov, v) in taps[q]:
                        K = K.at[ou - omin, ov - omin, :,
                                 ph * cout:(ph + 1) * cout].set(w[u, v])
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            K.astype(self.dtype),
            window_strides=(1, 1),
            padding=((-omin, omax), (-omin, omax)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        n, h, wid, _ = out.shape
        out = out.reshape(n, h, wid, 2, 2, cout)
        out = out.transpose(0, 1, 3, 2, 4, 5)  # N, h, p, w, q, co
        out = out.reshape(n, 2 * h, 2 * wid, cout)
        return out + b.astype(self.dtype)

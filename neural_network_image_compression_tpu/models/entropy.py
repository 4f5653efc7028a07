"""Rate models.

Two options, selected by ``config.EntropyConfig.kind``:

- :class:`EntropyRegressor` — capability parity with the reference's
  ``Entropynet`` (reference tf2_0/src/training.py:25-42): a CNN+MLP that
  regresses a scalar predicted rate from the latent, clipped to [0,8]. The
  reference trains it with MSE against a PNG-byte-size proxy and uses its
  prediction as the differentiable rate term in the R-D loss.

- :class:`FactorizedEntropyModel` — the TPU-native default the reference
  lacks: a fully factorized learned density (Ballé et al. 2018-style deep
  monotone CDF per latent channel). It yields (a) a *true* differentiable
  rate in bits during training and (b) quantized fixed-point CDF tables that
  drive the rANS coder (coding/), replacing the reference's PNG/DEFLATE
  stand-in (reference tf2_0/src/utils.py:87).

The factorized model works in centered symbol units u = s - (L-1)/2 with bin
width 1 (L = quantization levels), so the training noise surrogate and the
coding tables share the same grid.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LIKELIHOOD_FLOOR = 1e-9


class EntropyRegressor(nn.Module):
    """Reference-faithful Entropynet (tf2_0/src/training.py:25-42).

    Input: latent [N,h,w,C]; output: predicted rate [N,1] clipped to [0,8].
    Note the reference's Dense(512) has no activation; kept as-is.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        x = act(nn.Conv(64, (5, 5), strides=(2, 2), padding="SAME", name="conv1")(x))
        x = act(nn.Conv(64, (3, 3), strides=(1, 1), padding="SAME", name="conv2")(x))
        x = act(nn.Conv(64, (3, 3), strides=(1, 1), padding="SAME", name="conv3")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, name="dense1")(x)
        x = nn.Dense(1, name="dense2")(x)
        return jnp.clip(x, 0.0, 8.0)


class FactorizedEntropyModel(nn.Module):
    """Fully factorized learned density over quantized latent symbols.

    Each latent channel gets an independent univariate CDF c(u) built from a
    chain of monotone layers (softplus-positive matrices, tanh gates). All
    channels evaluate in parallel as batched [C, d_in, d_out] einsums — one
    fused VPU/MXU pass on TPU rather than C tiny networks.
    """

    channels: int
    filters: tuple = (3, 3, 3)
    levels: int = 256
    init_scale: float = 128.0  # symbol-unit domain half-width

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        n_layers = len(dims) - 1
        scale = self.init_scale ** (1.0 / n_layers)
        matrices, biases, gates = [], [], []
        for k in range(n_layers):
            d_in, d_out = dims[k], dims[k + 1]
            h_init = float(np.log(np.expm1(1.0 / scale / d_out)))
            matrices.append(
                self.param(
                    f"matrix_{k}",
                    nn.initializers.constant(h_init),
                    (self.channels, d_in, d_out),
                    jnp.float32,
                )
            )
            biases.append(
                self.param(
                    f"bias_{k}",
                    nn.initializers.uniform(scale=1.0),
                    (self.channels, 1, d_out),
                    jnp.float32,
                )
            )
            if k < n_layers - 1:
                gates.append(
                    self.param(
                        f"gate_{k}",
                        nn.initializers.zeros,
                        (self.channels, 1, d_out),
                        jnp.float32,
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._gates = gates

    def _logits(self, u: jnp.ndarray) -> jnp.ndarray:
        """Monotone chain. u: [C, M] centered symbol values -> logits [C, M].

        The einsums are pinned to ``Precision.HIGHEST``: at TPU default
        precision they run on the MXU in bf16 and the resulting bits are off
        by up to 0.5/element against the true f32 density (found by the
        bench.py parity gate — the Pallas kernel, which accumulates in f32,
        disagreed with this path ON THE CHIP while matching on CPU). The
        chain is 1->3->3->3->1 wide, so full precision costs nothing."""
        x = u[:, :, None]  # [C, M, 1]
        n_layers = len(self._matrices)
        for k in range(n_layers):
            x = (
                jnp.einsum(
                    "cmi,cio->cmo", x, jax.nn.softplus(self._matrices[k]),
                    precision=jax.lax.Precision.HIGHEST,
                )
                + self._biases[k]
            )
            if k < n_layers - 1:
                x = x + jnp.tanh(self._gates[k]) * jnp.tanh(x)
        return x[:, :, 0]

    def __call__(self, z_sym: jnp.ndarray) -> jnp.ndarray:
        """Bits per element for (possibly noisy) symbol-grid values.

        z_sym: [..., C] float values on the symbol grid [0, levels-1]
        (training passes quantizer noise through). Returns [..., C] bits.
        """
        center = (self.levels - 1) / 2.0
        u = jnp.moveaxis(z_sym, -1, 0).reshape(self.channels, -1) - center
        lower = self._logits(u - 0.5)
        upper = self._logits(u + 0.5)
        # Stable CDF difference: evaluate the sigmoid on the side of the
        # distribution tail with the better-conditioned exponent.
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        likelihood = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )
        likelihood = jnp.maximum(likelihood, LIKELIHOOD_FLOOR)
        bits = -jnp.log2(likelihood)
        bits = bits.reshape((self.channels,) + z_sym.shape[:-1])
        return jnp.moveaxis(bits, 0, -1)

    def pmf(self) -> jnp.ndarray:
        """[C, levels] probability mass over all symbols (for coding tables).

        Tail mass beyond the symbol range is folded into the edge symbols so
        the table sums to 1 and the coder can encode any symbol.
        """
        center = (self.levels - 1) / 2.0
        grid = jnp.arange(self.levels, dtype=jnp.float32) - center
        u = jnp.broadcast_to(grid[None, :], (self.channels, self.levels))
        lower = jax.nn.sigmoid(self._logits(u - 0.5))
        upper = jax.nn.sigmoid(self._logits(u + 0.5))
        pmf = upper - lower
        # Fold tails: everything below symbol 0 and above symbol L-1.
        pmf = pmf.at[:, 0].add(lower[:, 0])
        pmf = pmf.at[:, -1].add(1.0 - upper[:, -1])
        return jnp.maximum(pmf, 0.0)


# --------------------------------------------------- spatial context modeling


def checkerboard_mask(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[h, w, 1] mask, 1 at anchor positions ((i + j) even), 0 elsewhere.

    Two-pass checkerboard context (He et al., CVPR 2021 pattern): anchors are
    coded with the factorized model; non-anchors are coded conditionally on
    the decoded anchors. Both passes are full-grid convolutions — no
    autoregressive scan — so encode AND decode stay one jitted TPU program
    each, unlike raster-order context models.
    """
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[None, :]
    return (((ii + jj) % 2) == 0).astype(dtype)[..., None]


class CheckerboardContext(nn.Module):
    """Conditional Gaussian parameters for non-anchor latents.

    Input: the latent grid with non-anchor positions zeroed, values
    normalized to [-1, 1] (symbol units / (L-1), recentred). Output: per
    position and channel (mean, scale) of a Gaussian over SYMBOL units.

    The receptive field (5x5 then two 3x3) sees 8+ anchor neighbours of every
    non-anchor position; all convs are SAME so the parameter grid matches the
    latent grid. This is the spatial-redundancy model the factorized density
    cannot express — it is what lets the rANS bitstream beat the reference's
    DEFLATE (which exploits the same redundancy generically via LZ77).
    """

    channels: int
    hidden: int = 96
    levels: int = 256
    scale_min: float = 0.11
    scale_max: float = 256.0
    # Output geometry: mean = center + mean_off * mean_span (symbol units);
    # sigma starts at scale_init (zero-init final conv). On the unit grid
    # symbols span the whole [0, L-1] range so the span/init are wide; the
    # integer grid concentrates symbols near L/2, so a tight span/init gives
    # the encoder useful rate gradients from step 1 (see config.QuantizerConfig).
    mean_span: float = 127.5
    scale_init: float = 64.0

    @nn.compact
    def __call__(self, anchors_norm: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        x = act(nn.Conv(self.hidden, (5, 5), padding="SAME", name="ctx1")(anchors_norm))
        x = act(nn.Conv(self.hidden, (3, 3), padding="SAME", name="ctx2")(x))
        out = nn.Conv(2 * self.channels, (3, 3), padding="SAME", name="ctx3",
                      kernel_init=nn.initializers.zeros)(x)
        mean_off, raw_scale = jnp.split(out, 2, axis=-1)
        center = (self.levels - 1) / 2.0
        mean = center + mean_off * self.mean_span  # symbol units
        # Zero-init conv => raw_scale 0 => sigma starts at scale_init,
        # an uninformative conditional at the grid's natural width.
        scale = jnp.clip(
            jax.nn.softplus(raw_scale + _softplus_inv(self.scale_init)),
            self.scale_min,
            self.scale_max,
        )
        return mean, scale


def _softplus_inv(y: float) -> float:
    return float(np.log(np.expm1(y)))


def conditional_gaussian_bits(z_sym: jnp.ndarray, mean: jnp.ndarray,
                              scale: jnp.ndarray) -> jnp.ndarray:
    """Bits for (possibly noisy) symbol-grid values under N(mean, scale^2)
    integrated over the unit quantization bin. All args broadcastable
    [..., C]; returns bits [..., C]. Matches the coding tables' discretized
    Gaussian (coding/cdf.py gaussian_scale_cdfs) up to scale-bin rounding."""
    d = (z_sym - mean) / scale
    half = 0.5 / scale
    # Stable: evaluate both CDF points on the tail side via |d|.
    upper = jax.scipy.special.ndtr(half - jnp.abs(d))
    lower = jax.scipy.special.ndtr(-half - jnp.abs(d))
    likelihood = jnp.maximum(upper - lower, LIKELIHOOD_FLOOR)
    return -jnp.log2(likelihood)


class ChannelContext(nn.Module):
    """Channel-wise autoregressive conditional (CHARM-style, Minnen &
    Singh 2020 — PAPERS.md "Channel-wise Autoregressive Entropy Models").

    The latent's C channels split into ``num_slices`` equal slices coded in
    order: slice 0 with the factorized density (+ optional per-image adaptive
    tables), every later slice s with a Gaussian whose (mean, scale) a small
    conv stack predicts from ALL spatial positions of the already-coded
    slices ``[:start_s]``. Complementary to the checkerboard (which sees all
    channels of neighbouring positions but nothing of the current one) and —
    unlike the hyperprior — transmits no side information and has no
    patch-statistics-sensitive hyper net (the r2/r3 finding: hyper-side
    conditioning overfits 128x128 training patches and loses on Kodak).

    TPU notes: no spatial autoregression — decode is ``num_slices`` dense
    conv passes, each fully parallel over the grid; encode is a single pass.
    Input: the full normalized latent grid [M,h,w,C]; slice s's stack reads
    only its causal prefix ``x[..., :start_s]``, so running the module on a
    partially-decoded grid yields exact outputs for the next slice while
    later slices' outputs are ignored (this is what makes one compact
    __call__ serve both the one-shot encoder and the progressive decoder
    with identical parameters).

    Returns (mean, scale) [M,h,w,C - C/num_slices] in symbol units, covering
    channels ``[C/num_slices:]`` (slice 0 has no conditional).
    """

    channels: int
    num_slices: int = 4
    hidden: int = 96
    levels: int = 256
    scale_min: float = 0.11
    scale_max: float = 256.0
    mean_span: float = 127.5
    scale_init: float = 64.0

    @nn.compact
    def __call__(
        self, z_norm: jnp.ndarray, only_slice: int | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """``only_slice=s`` computes just slice s's conditional stack
        (returns [M,h,w,C/num_slices]) — the progressive decoder's per-pass
        call, which otherwise pays all S-1 stacks per pass for outputs it
        discards (O(S^2) total conv work instead of O(S))."""
        if self.channels % self.num_slices:
            raise ValueError(
                f"latent channels {self.channels} not divisible by "
                f"num_slices {self.num_slices}"
            )
        width = self.channels // self.num_slices
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        means, scales = [], []
        center = (self.levels - 1) / 2.0
        which = (
            (only_slice,) if only_slice is not None
            else range(1, self.num_slices)
        )
        for s in which:
            x = z_norm[..., : s * width]
            x = act(nn.Conv(self.hidden, (5, 5), padding="SAME",
                            name=f"cc{s}_1")(x))
            x = act(nn.Conv(self.hidden, (3, 3), padding="SAME",
                            name=f"cc{s}_2")(x))
            raw = nn.Conv(2 * width, (3, 3), padding="SAME", name=f"cc{s}_3",
                          kernel_init=nn.initializers.zeros)(x)
            mean_off, raw_scale = jnp.split(raw, 2, axis=-1)
            means.append(center + mean_off * self.mean_span)
            scales.append(jnp.clip(
                jax.nn.softplus(raw_scale + _softplus_inv(self.scale_init)),
                self.scale_min,
                self.scale_max,
            ))
        return jnp.concatenate(means, axis=-1), jnp.concatenate(scales, axis=-1)

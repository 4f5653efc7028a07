"""Pallas kernel: on-chip evaluation of the factorized entropy model.

Evaluates bits = -log2(c(u+.5) - c(u-.5)) for every latent element in one
fused VPU pass — the learned-CDF rate estimation of the north star evaluated
on-chip without materializing the chain's intermediates in HBM (the XLA path
in models/entropy.py builds [C, M, 3] intermediates per layer; here everything
lives in registers/VMEM).

Forward/inference only (no VJP): training uses the XLA path, which
differentiates; this kernel serves rate reporting and RD-decision loops at
encode time. Layout: channels on sublanes, elements on lanes; per-channel
coefficients broadcast along lanes. Hardcoded to the default filters (3,3,3).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LIKELIHOOD_FLOOR = 1e-9
_LOG2E = 1.4426950408889634


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _chain_eval(u, mats, biases, gates):
    """u: [C, M]. mats[k]: [C, d_in, d_out] VMEM values. Returns logits [C,M].
    Unrolled over the (1,3,3,3,1) dims: h is a list of [C, M] arrays."""
    h = [u]
    n_layers = len(mats)
    for k in range(n_layers):
        m = _softplus(mats[k])  # [C, d_in, d_out]
        d_in, d_out = m.shape[1], m.shape[2]
        nxt = []
        for j in range(d_out):
            acc = biases[k][:, 0, j][:, None]
            for i in range(d_in):
                acc = acc + h[i] * m[:, i, j][:, None]
            if k < n_layers - 1:
                g = jnp.tanh(gates[k][:, 0, j])[:, None]
                acc = acc + g * jnp.tanh(acc)
            nxt.append(acc)
        h = nxt
    return h[0]


def _make_kernel(n_layers, center):
    def kernel(z_ref, *refs):
        mats = [refs[3 * k] for k in range(n_layers)]
        biases = [refs[3 * k + 1] for k in range(n_layers)]
        gates = [refs[3 * k + 2] for k in range(n_layers)]
        out_ref = refs[3 * n_layers]
        mats_v = [m[:] for m in mats]
        biases_v = [b[:] for b in biases]
        gates_v = [g[:] for g in gates]
        u = z_ref[:] - center
        lo = _chain_eval(u - 0.5, mats_v, biases_v, gates_v)
        hi = _chain_eval(u + 0.5, mats_v, biases_v, gates_v)
        sign = -jnp.sign(lo + hi)
        lik = jnp.abs(jax.nn.sigmoid(sign * hi) - jax.nn.sigmoid(sign * lo))
        lik = jnp.maximum(lik, _LIKELIHOOD_FLOOR)
        out_ref[:] = -jnp.log(lik) * _LOG2E

    return kernel


@functools.partial(jax.jit, static_argnames=("levels", "interpret"))
def factorized_bits_pallas(
    z: jnp.ndarray, params: dict, levels: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """Bits per element for symbol-grid values.

    z: [..., C] float (symbol units, like FactorizedEntropyModel.__call__);
    params: the FactorizedEntropyModel params dict (matrix_k/bias_k/gate_k).
    Returns [..., C] bits — parity with the XLA path to float tolerance.
    """
    n_layers = sum(1 for k in params if k.startswith("matrix_"))
    c = params["matrix_0"].shape[0]
    orig_shape = z.shape
    m = int(z.size) // c
    zt = jnp.moveaxis(z, -1, 0).reshape(c, m)

    mt = 512  # lane-tile
    m_pad = (-m) % mt
    if m_pad:
        zt = jnp.pad(zt, ((0, 0), (0, m_pad)))
    mp = m + m_pad

    operands = [zt]
    in_specs = [pl.BlockSpec((c, mt), lambda i: (0, i), memory_space=pltpu.VMEM)]
    for k in range(n_layers):
        for name in (f"matrix_{k}", f"bias_{k}", f"gate_{k}"):
            arr = params.get(name)
            if arr is None:  # last layer has no gate; pass a dummy
                arr = jnp.zeros_like(params[f"bias_{k}"])
            operands.append(arr)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(n_layers, (levels - 1) / 2.0),
        grid=(mp // mt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((c, mt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, mp), jnp.float32),
        interpret=interpret,
    )(*operands)
    out = out[:, :m].reshape((c,) + orig_shape[:-1])
    return jnp.moveaxis(out, 0, -1)

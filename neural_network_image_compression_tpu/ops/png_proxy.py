"""PNG-size rate proxy (reference parity mode).

The reference computes its training rate target by PNG-encoding the packed
uint8 latent *inside the train step* (``tf.image.encode_png`` +
``tf.strings.length``, reference tf2_0/src/training.py:12-21) — the dominant
non-matmul cost of its hot loop. There is no TPU PNG encoder; in the
reference-faithful mode we route the packed latent through a host callback
(PIL/zlib) via ``jax.pure_callback``. The default training mode avoids this
entirely (factorized entropy model), so the callback only runs when parity
with the reference's exact rate definition is requested.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.data.io import png_num_bytes
from neural_network_image_compression_tpu.ops.pack import pack_latent


def _host_png_bpp(packed: np.ndarray, tot_pixels: np.ndarray) -> np.ndarray:
    sizes = np.array(
        [png_num_bytes(packed[i]) for i in range(packed.shape[0])], np.float32
    )
    return (8.0 * sizes / float(tot_pixels)).reshape(-1, 1)


def png_bpp_host(latent: np.ndarray, tot_pixels: int) -> np.ndarray:
    """Host-side twin of :func:`png_bpp` for platforms whose PJRT plugin has
    no host-callback support (the axon TPU tunnel): [N,h,w,C] float latents
    -> [N,1] bpp, byte-identical rate definition. The trainer computes the
    latents with a small jitted forward (same flip RNG as the train step) and
    feeds the resulting target back in as a step input."""
    sym = np.round(np.clip(np.asarray(latent), 0.0, 1.0) * 255.0).astype(np.uint8)
    n, h, w, c = sym.shape
    packed = sym.reshape(n, h * 4, w * (c // 4), 1)
    return _host_png_bpp(packed, np.int32(tot_pixels))


def png_bpp(latent: jnp.ndarray, tot_pixels: int) -> jnp.ndarray:
    """[N,h,w,C] float latent in [0,1] -> [N,1] PNG-bits-per-pixel.

    Matches reference ``get_bpp`` (tf2_0/src/training.py:14-21): round to
    uint8 symbols, raw-reshape pack to a single-channel image, PNG-encode
    with optimize=True, 8*bytes/tot_pixels. Non-differentiable (used only as
    the regressor's target, like the reference)."""
    sym = jnp.round(jnp.clip(latent, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    c = sym.shape[-1]
    packed = pack_latent(sym, (4, c // 4))  # C=32 -> the reference's (4, 8)
    out_shape = jax.ShapeDtypeStruct((sym.shape[0], 1), jnp.float32)
    return jax.pure_callback(
        _host_png_bpp,
        out_shape,
        packed,
        jnp.int32(tot_pixels),
        vmap_method="sequential",
    )

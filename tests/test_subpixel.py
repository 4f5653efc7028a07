"""SubpixelConvTranspose: the phase-decomposed stride-2 transposed conv.

Must be mathematically identical to flax.linen.ConvTranspose(SAME, stride 2)
with the SAME parameter tree (checkpoint drop-in), for every odd kernel and
shape the presets use. The engine is opt-in (ModelConfig.convt='subpixel'):
on TPU v5e the XLA lowering measured faster (RESULTS.md §8.9), but the
equivalence must hold wherever it is enabled.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from neural_network_image_compression_tpu.models.autoencoder import (
    SynthesisTransform,
)
from neural_network_image_compression_tpu.models.layers import (
    SubpixelConvTranspose,
)


@pytest.mark.parametrize(
    "h,w,cin,cout,k",
    [
        (7, 9, 3, 5, 5),   # odd spatial, k=5 (dconv1/7/8)
        (16, 24, 32, 64, 5),
        (1, 1, 2, 2, 5),   # degenerate 1x1 grid
        (8, 8, 4, 4, 3),   # k=3 generality
        (5, 6, 1, 1, 7),   # k=7 generality, single channel
    ],
)
def test_matches_flax_conv_transpose(h, w, cin, cout, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    ref_mod = nn.ConvTranspose(cout, (k, k), strides=(2, 2), padding="SAME")
    params = ref_mod.init(jax.random.key(1), x)
    ref = ref_mod.apply(params, x)
    # Identical param tree consumed directly — this is the drop-in guarantee.
    sub = SubpixelConvTranspose(cout, k).apply(params, x)
    assert ref.shape == sub.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(sub), atol=1e-5)


def test_even_kernel_rejected():
    x = jnp.zeros((1, 4, 4, 2))
    with pytest.raises(ValueError, match="odd"):
        SubpixelConvTranspose(2, 4).init(jax.random.key(0), x)


def test_k1_rejected():
    # k=1 is odd but jax's SAME conv-transpose pad rule changes when
    # stride > k-1, so the phase decomposition would silently mismatch
    # nn.ConvTranspose (ADVICE r4) — must refuse loudly.
    x = jnp.zeros((1, 4, 4, 2))
    with pytest.raises(ValueError, match="kernel_size >= 3"):
        SubpixelConvTranspose(2, 1).init(jax.random.key(0), x)


@pytest.mark.parametrize("preset,act", [("base", "preset_default"),
                                        ("base", "gdn"),
                                        ("deep", "preset_default")])
def test_synthesis_transform_engine_parity(preset, act):
    """Whole synthesis transform, xla vs subpixel engine, shared params."""
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.random((2, 9, 11, 32)), jnp.float32)
    xla = SynthesisTransform(out_channels=1, preset=preset, activation=act,
                             convt="xla")
    params = xla.init(jax.random.key(0), lat)
    a = xla.apply(params, lat)
    b = SynthesisTransform(out_channels=1, preset=preset, activation=act,
                           convt="subpixel").apply(params, lat)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.ops import (
    pack_latent,
    pack_planes,
    unpack_latent,
    unpack_planes,
)


def test_pack_is_raw_reshape(rng):
    """The reference packs with a plain row-major reshape
    (tf2_0/src/utils.py:38-40) — byte layout must match exactly."""
    lat = rng.integers(0, 256, (2, 4, 6, 32), dtype=np.uint8)
    packed = np.asarray(pack_latent(jnp.asarray(lat)))
    assert packed.shape == (2, 16, 48, 1)
    np.testing.assert_array_equal(packed, lat.reshape(2, 16, 48, 1))


def test_pack_unpack_bijection(rng):
    lat = rng.integers(0, 256, (3, 5, 7, 32), dtype=np.uint8)
    out = np.asarray(unpack_latent(pack_latent(jnp.asarray(lat))))
    np.testing.assert_array_equal(out, lat)


def test_pack_planes_round_trip(rng):
    lat96 = rng.integers(0, 256, (2, 8, 8, 96), dtype=np.uint8)
    packed = pack_planes(jnp.asarray(lat96))
    assert packed.shape == (2, 32, 64, 3)
    out = np.asarray(unpack_planes(packed))
    np.testing.assert_array_equal(out, lat96)


def test_pack_planes_matches_reference_concat(rng):
    """Channel i of the packed image is the reshaped i-th plane latent
    (reference tf2_0/src/utils.py:38-40)."""
    lat96 = rng.integers(0, 256, (1, 4, 4, 96), dtype=np.uint8)
    packed = np.asarray(pack_planes(jnp.asarray(lat96)))
    for i in range(3):
        expected = lat96[..., 32 * i : 32 * (i + 1)].reshape(1, 16, 32)
        np.testing.assert_array_equal(packed[..., i], expected)

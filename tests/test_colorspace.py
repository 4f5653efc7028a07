import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.ops import (
    YCBCR,
    PCA,
    get_colorspace,
    planes_to_rgb,
    rgb_to_planes,
)


@pytest.mark.parametrize("cs", [YCBCR, PCA])
def test_round_trip(cs, rng):
    rgb = rng.random((2, 16, 16, 3)).astype(np.float32)
    planes = rgb_to_planes(jnp.asarray(rgb), cs)
    back = planes_to_rgb(planes, cs)
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-5)


def test_ycbcr_known_values():
    # Pure white -> Y=1, Cb=Cr=0.5 (full-range JPEG YCbCr).
    white = jnp.ones((1, 1, 1, 3))
    planes = np.asarray(rgb_to_planes(white, YCBCR))
    np.testing.assert_allclose(planes[0, 0, 0], [1.0, 0.5, 0.5], atol=1e-5)
    # Pure red -> Y=0.299.
    red = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(1.0)
    planes = np.asarray(rgb_to_planes(red, YCBCR))
    assert abs(planes[0, 0, 0, 0] - 0.299) < 1e-6
    assert abs(planes[0, 0, 0, 2] - 1.0) < 1e-5  # Cr = 0.5 + 0.5


def test_inverse_kernel_is_matrix_inverse():
    for cs in (YCBCR, PCA):
        np.testing.assert_allclose(
            cs.kernel @ cs.inv_kernel, np.eye(3), atol=1e-5
        )


def test_get_colorspace():
    assert get_colorspace("ycbcr") is YCBCR
    assert get_colorspace("pca") is PCA
    with pytest.raises(ValueError):
        get_colorspace("nope")

import jax.numpy as jnp
import numpy as np

from neural_network_image_compression_tpu.ops import ms_ssim, psnr, ssim


def test_psnr_known_value(rng):
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    mse = np.mean((a - b) ** 2, axis=(1, 2, 3))
    expected = 10 * np.log10(1.0 / mse)
    np.testing.assert_allclose(np.asarray(psnr(jnp.asarray(a), jnp.asarray(b))),
                               expected, rtol=1e-4)


def test_ssim_identity(rng):
    a = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ssim(a, a)), [1.0, 1.0], atol=1e-5)


def test_ssim_decreases_with_noise(rng):
    a = rng.random((1, 64, 64, 1)).astype(np.float32)
    small = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1).astype(np.float32)
    big = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    s_small = float(ssim(jnp.asarray(a), jnp.asarray(small))[0])
    s_big = float(ssim(jnp.asarray(a), jnp.asarray(big))[0])
    assert 1.0 > s_small > s_big > 0.0


def test_ssim_max_val_scaling(rng):
    """SSIM(a,b,max_val=1) == SSIM(255a,255b,max_val=255), as in the
    reference's two usages (training at max_val=1, eval at max_val=255)."""
    a = rng.random((1, 48, 48, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    s1 = float(ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0)[0])
    s255 = float(ssim(jnp.asarray(a * 255), jnp.asarray(b * 255), max_val=255.0)[0])
    assert abs(s1 - s255) < 1e-4


def test_ms_ssim_identity_and_ordering(rng):
    a = rng.random((1, 192, 192, 1)).astype(np.float32)
    noisy = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    m_id = float(ms_ssim(jnp.asarray(a), jnp.asarray(a))[0])
    m_noisy = float(ms_ssim(jnp.asarray(a), jnp.asarray(noisy))[0])
    assert abs(m_id - 1.0) < 1e-4
    assert 0.0 < m_noisy < m_id


def test_ms_ssim_odd_size(rng):
    a = jnp.asarray(rng.random((1, 181, 201, 3)).astype(np.float32))
    v = float(ms_ssim(a, a)[0])
    assert abs(v - 1.0) < 1e-4

"""Mean-scale hyperprior: model geometry, training rate path, and the
two-stream bitstream round-trip (models/hyperprior.py + coding path)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.config import (
    Config,
    DataConfig,
    EntropyConfig,
    ModelConfig,
    QuantizerConfig,
    TrainConfig,
)
from neural_network_image_compression_tpu.models import NeuralCodec
from neural_network_image_compression_tpu.models.hyperprior import hyper_grid_hw


def _hyper_cfg(**entropy_overrides):
    ent = dict(context="hyperprior")
    ent.update(entropy_overrides)
    return Config(
        model=ModelConfig(clip_latent=False),
        entropy=EntropyConfig(**ent),
        quantizer=QuantizerConfig(grid="integer"),
    )


@pytest.fixture(scope="module")
def hyper_codec():
    cfg = _hyper_cfg()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    return codec, params


def test_hyper_grid_hw():
    assert hyper_grid_hw((16, 16)) == (4, 4)
    assert hyper_grid_hw((17, 18)) == (5, 5)  # ceil(ceil(17/2)/2)=5, 18->5
    assert hyper_grid_hw((1, 1)) == (1, 1)


def test_param_groups_exist(hyper_codec):
    codec, params = hyper_codec
    for g in (
        "hyper_enc_y", "hyper_enc_c", "hyper_dec_y", "hyper_dec_c",
        "hyper_entropy_y", "hyper_entropy_c",
    ):
        assert g in params, g


def test_plane_rate_bits_includes_side_info(hyper_codec, rng):
    """Total rate must include the transmitted z bits (strictly greater than
    the conditional main bits alone)."""
    codec, params = hyper_codec
    z_sym = jnp.asarray(
        rng.normal(128, 3, (2, 8, 12, 32)).astype(np.float32)
    )
    total = codec.plane_rate_bits(params, "y", z_sym, jax.random.key(1))
    assert total.shape == (2,)
    z = codec.hyper_z(params, "y", z_sym)
    mean, scale = codec.hyper_conditional(params, "y", z, (8, 12))
    from neural_network_image_compression_tpu.models.entropy import (
        conditional_gaussian_bits,
    )

    main_only = jnp.sum(
        conditional_gaussian_bits(z_sym, mean, scale), axis=(1, 2, 3)
    )
    assert np.all(np.asarray(total) > np.asarray(main_only))


def test_hyper_bitstream_round_trip_bit_exact(hyper_codec, rng, jit_forward):
    from neural_network_image_compression_tpu.coding import (
        compress_image,
        decompress_image,
    )
    from neural_network_image_compression_tpu.coding.container import (
        unpack_container,
    )

    codec, params = hyper_codec
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    blob = compress_image(codec, params, rgb)
    header, streams = unpack_container(blob)
    assert header.hyper and header.passes == 2 and len(streams) == 6
    recon = decompress_image(codec, params, blob)
    direct = jit_forward(codec, params, rgb)
    np.testing.assert_array_equal(recon, direct)


def test_hyper_odd_latent_grid(rng, jit_forward):
    """Odd image sizes -> odd latent grids -> hyper decoder crop path."""
    cfg = _hyper_cfg()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    from neural_network_image_compression_tpu.coding import (
        compress_image,
        decompress_image,
    )

    rgb = rng.integers(0, 256, (72, 104, 3), dtype=np.uint8)  # lat 9x13
    blob = compress_image(codec, params, rgb)
    recon = decompress_image(codec, params, blob)
    direct = jit_forward(codec, params, rgb)
    np.testing.assert_array_equal(recon, direct)


def test_hyper_lambda_controls_rate():
    """The hyperprior training path must collapse rate under a big lambda
    (same property as the checkerboard/integer-grid test)."""
    from neural_network_image_compression_tpu.training import (
        init_train_state,
        make_train_step,
    )

    # local rng: the shared session fixture's draw position depends on test
    # order and this margin-based test must be deterministic
    imgs = (np.random.default_rng(7).random((4, 16, 16, 3)) * 255).astype(
        np.uint8
    )

    def run(lam):
        cfg = _hyper_cfg().replace(
            data=DataConfig(patch_size=16),
            train=TrainConfig(
                batch_size=4, rd_lambda=lam, rd_lambda_step=0.0,
                learning_rate=1e-3, distortion="mse",
                val_every_steps=0, checkpoint_every_steps=0,
                log_every_steps=10_000,
            ),
        )
        codec = NeuralCodec(cfg)
        state = init_train_state(codec, jax.random.key(0), cfg)
        step = jax.jit(make_train_step(codec, cfg))
        key = jax.random.key(5)
        for _ in range(120):
            key, sub = jax.random.split(key)
            state, metrics = step(state, imgs, sub)
        return float(metrics["bpp_y"]) + float(metrics["bpp_cb"])

    high = run(10.0)
    low = run(0.0)
    assert np.isfinite(high) and np.isfinite(low)
    assert high < 0.9 * low, (high, low)

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_image_compression_tpu.config import (
    Config,
    DataConfig,
    EntropyConfig,
    QuantizerConfig,
    TrainConfig,
)
from neural_network_image_compression_tpu.models import NeuralCodec
from neural_network_image_compression_tpu.training import (
    CheckpointStore,
    Trainer,
    init_train_state,
    make_train_step,
)


def _tiny_cfg(**train_overrides):
    train = dict(
        batch_size=4,
        max_epochs=2,
        val_every_steps=0,
        checkpoint_every_steps=0,
        log_every_steps=10_000,
        distortion="ssim",
    )
    train.update(train_overrides)
    return Config(
        data=DataConfig(patch_size=16),
        train=TrainConfig(**train),
    )


@pytest.fixture(scope="module")
def tiny_images():
    rng = np.random.default_rng(42)
    # Smooth-ish images so SSIM has structure to latch onto.
    base = rng.random((8, 16, 16, 3)).astype(np.float32)
    return (base * 255).astype(np.uint8)


def test_train_step_runs_and_updates(tiny_images):
    cfg = _tiny_cfg()
    codec = NeuralCodec(cfg)
    state = init_train_state(codec, jax.random.key(0), cfg)
    step = jax.jit(make_train_step(codec, cfg))
    new_state, metrics = step(state, tiny_images[:4], jax.random.key(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params must actually move
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(new_state.params)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before))


def test_loss_decreases_over_steps(tiny_images):
    cfg = _tiny_cfg()
    codec = NeuralCodec(cfg)
    state = init_train_state(codec, jax.random.key(0), cfg)
    step = jax.jit(make_train_step(codec, cfg))
    key = jax.random.key(2)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, tiny_images[:4], sub)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_trainer_fit_and_resume(tiny_images, tmp_path):
    cfg = _tiny_cfg()
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    state = trainer.fit(train_images=tiny_images, max_steps=3)
    assert int(state.step) == 3
    assert os.path.exists(tmp_path / "run" / "config.json")
    # resume continues from the stored step
    trainer2 = Trainer(cfg, run_dir=str(tmp_path / "run"))
    state2 = trainer2.fit(train_images=tiny_images, max_steps=2, resume=True)
    assert int(state2.step) == 5


def test_checkpoint_round_trip(tiny_images, tmp_path):
    cfg = _tiny_cfg()
    codec = NeuralCodec(cfg)
    state = init_train_state(codec, jax.random.key(0), cfg)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save(state, epoch=7)
    template = init_train_state(codec, jax.random.key(3), cfg)
    restored, epoch = store.restore(template)
    assert epoch == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_faithful_regressor_step(tiny_images):
    """Entropynet + PNG-target mode (reference tf2_0 semantics): the PNG
    target is host-computed from the same-RNG latents and fed in as a step
    input (no host callbacks — the axon TPU plugin lacks them)."""
    cfg = Config(
        data=DataConfig(patch_size=16),
        train=TrainConfig(
            batch_size=2, chroma_lambda=0.01, val_every_steps=0,
            checkpoint_every_steps=0, log_every_steps=10_000,
        ),
        entropy=EntropyConfig(kind="regressor", regressor_target="png"),
        quantizer=QuantizerConfig(surrogate="noise", noise_to_rate_model=False),
    )
    codec = NeuralCodec(cfg)
    state = init_train_state(codec, jax.random.key(0), cfg)
    step_fn = make_train_step(codec, cfg)
    assert step_fn.needs_rate_target
    from neural_network_image_compression_tpu.ops.png_proxy import png_bpp_host
    from neural_network_image_compression_tpu.training.train_step import (
        make_rate_latents_fn,
    )

    step = jax.jit(step_fn)
    lat_fn = jax.jit(make_rate_latents_fn(codec, cfg))
    batch, key = tiny_images[:2], jax.random.key(1)
    lat = jax.device_get(lat_fn(state.params, batch, key))
    target = png_bpp_host(lat, batch.shape[1] * batch.shape[2])
    new_state, metrics = step(state, batch, key, jnp.asarray(target))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["aux_loss"]))
    assert float(metrics["bpp_y"]) > 0  # PNG proxy produced a real rate
    # target matches the reference's in-graph definition (callback version)
    from neural_network_image_compression_tpu.ops.png_proxy import png_bpp

    np.testing.assert_allclose(
        target,
        np.asarray(png_bpp(jnp.asarray(lat), batch.shape[1] * batch.shape[2])),
        rtol=1e-6,
    )


def test_integer_grid_lambda_controls_rate(tiny_images):
    """Round-2 core fix (VERDICT.md item 1): on the unbounded integer symbol
    grid the R-D lambda must actually move the rate. Train two tiny models,
    one with a huge rate weight, one with ~none; the huge-lambda model's
    differentiable bpp must collapse well below the other's."""
    from neural_network_image_compression_tpu.config import tpu_native

    import dataclasses

    def run(lam):
        cfg = tpu_native(rd_lambda=lam).replace(
            data=DataConfig(patch_size=16),
            train=TrainConfig(
                batch_size=4, rd_lambda=lam, rd_lambda_step=0.0,
                learning_rate=1e-3, distortion="mse",
                val_every_steps=0, checkpoint_every_steps=0,
                log_every_steps=10_000,
            ),
        )
        # float32 on CPU (bfloat16 conv is slow and irrelevant here)
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype="float32")
        )
        codec = NeuralCodec(cfg)
        state = init_train_state(codec, jax.random.key(0), cfg)
        step = jax.jit(make_train_step(codec, cfg))
        key = jax.random.key(5)
        for _ in range(150):
            key, sub = jax.random.split(key)
            state, metrics = step(state, tiny_images[:4], sub)
        return float(metrics["bpp_y"]) + float(metrics["bpp_cb"])

    high = run(10.0)
    low = run(0.0)
    assert np.isfinite(high) and np.isfinite(low)
    # measured: ~4.6 vs ~5.7 after 150 steps (and diverging further)
    assert high < 0.9 * low, (high, low)


def test_freeze_transforms_exact_under_nonzero_moments(tiny_images):
    """ADVICE r1: zeroing gradients under Adam still updates params while the
    first moment decays. The optax.multi_transform freeze must hold the
    transforms EXACTLY still even when training resumes from a state whose
    transform moments are nonzero."""
    import copy

    import optax

    from neural_network_image_compression_tpu.training.train_step import (
        make_optimizer,
    )

    # Phase 1: normal training -> nonzero Adam moments everywhere.
    cfg = _tiny_cfg()
    codec = NeuralCodec(cfg)
    state = init_train_state(codec, jax.random.key(0), cfg)
    step = jax.jit(make_train_step(codec, cfg))
    key = jax.random.key(9)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, _ = step(state, tiny_images[:4], sub)

    # Phase 2: freeze_transforms run whose optimizer *state tree* keeps the
    # warm-started params but fresh (frozen-aware) moments; then verify the
    # transforms never move across steps.
    fcfg = _tiny_cfg(freeze_transforms=True)
    fcodec = NeuralCodec(fcfg)
    ftx = make_optimizer(fcfg)
    params = jax.device_get(state.params)
    fstate = init_train_state(fcodec, jax.random.key(1), fcfg)._replace(
        params=params, opt_state=ftx.init(params)
    )
    before = {
        k: copy.deepcopy(jax.device_get(v))
        for k, v in params.items()
        if k.startswith(("analysis", "synthesis"))
    }
    fstep = jax.jit(make_train_step(fcodec, fcfg))
    for _ in range(5):
        key, sub = jax.random.split(key)
        fstate, metrics = fstep(fstate, tiny_images[:4], sub)
    after = jax.device_get(fstate.params)
    for k, tree in before.items():
        for a, b in zip(
            jax.tree_util.tree_leaves(tree),
            jax.tree_util.tree_leaves(after[k]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...while the rate side did train
    moved = False
    for k in after:
        if k.startswith(("analysis", "synthesis")):
            continue
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(params[k])),
            jax.tree_util.tree_leaves(after[k]),
        ):
            if np.abs(np.asarray(a) - np.asarray(b)).max() > 0:
                moved = True
    assert moved

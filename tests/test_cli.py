"""CLI argument -> Config wiring (the round-1 advisor found a silent-override
bug here; these tests pin the fallback semantics)."""
import argparse

from neural_network_image_compression_tpu.cli import _build_config


def _args(**over):
    base = dict(
        data="/tmp/x", val="/tmp/y", batch_size=64, epochs=30,
        rd_lambda=0.01, rd_lambda_step=None, distortion="ssim",
        preset="base", compute_dtype=None, bitstream=None,
        entropy_context=None, reference_faithful=False, tpu_native=False,
        freeze_transforms=False, val_every_steps=None, surrogate=None,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_default_config_wiring():
    cfg = _build_config(_args())
    assert cfg.model.compute_dtype == "float32"
    assert cfg.entropy.context == "none"
    assert cfg.train.rd_lambda_step == 0.01
    assert cfg.codec.bitstream == "rans"


def test_tpu_native_preset_not_clobbered_by_defaults():
    """Omitted flags must fall back to the preset, not override it."""
    cfg = _build_config(_args(tpu_native=True))
    assert cfg.model.compute_dtype == "bfloat16"   # preset's dtype survives
    assert cfg.model.clip_latent is False
    assert cfg.quantizer.grid == "integer"
    assert cfg.entropy.context == "checkerboard"   # ADVICE r1: no forced 'none'
    assert cfg.train.rd_lambda_step == 0.0         # fixed-lambda preset survives


def test_explicit_flags_override_preset():
    cfg = _build_config(
        _args(tpu_native=True, compute_dtype="float32",
              entropy_context="hyperprior", rd_lambda_step=0.02)
    )
    assert cfg.model.compute_dtype == "float32"
    assert cfg.entropy.context == "hyperprior"
    assert cfg.train.rd_lambda_step == 0.02


def test_reference_faithful_wiring():
    cfg = _build_config(_args(reference_faithful=True))
    assert cfg.entropy.kind == "regressor"
    assert cfg.entropy.regressor_target == "png"
    assert cfg.quantizer.noise_to_rate_model is False
    assert cfg.train.chroma_lambda == 0.01
    assert cfg.codec.bitstream == "png"


def test_surrogate_flag_wiring():
    cfg = _build_config(_args(surrogate=None))
    assert cfg.quantizer.surrogate == "noise"
    cfg = _build_config(_args(surrogate="noise+ste", tpu_native=True))
    assert cfg.quantizer.surrogate == "noise+ste"
    assert cfg.quantizer.grid == "integer"


def test_hyperprior_context_choice_accepted():
    """Regression: the --entropy-context choices list must include every
    config-supported context (queue-B hyper runs died on argparse)."""
    from neural_network_image_compression_tpu.cli import main
    import pytest as _pytest

    # argparse exits 2 on invalid choice; building the parser path up to
    # config construction is enough — intercept before training starts by
    # passing a bogus data dir and catching the FileNotFoundError from fit.
    with _pytest.raises((SystemExit, FileNotFoundError, Exception)) as ei:
        main(["train", "--data", "/nonexistent_dir_xyz",
              "--entropy-context", "hyperprior", "--epochs", "0"])
    assert not (isinstance(ei.value, SystemExit) and ei.value.code == 2), (
        "argparse rejected --entropy-context hyperprior"
    )


def test_flagship_preset():
    from neural_network_image_compression_tpu.config import Config, flagship

    cfg = flagship(0.01)
    assert cfg.model.activation == "gdn"
    assert cfg.quantizer.grid == "integer"
    assert cfg.entropy.context == "checkerboard"
    assert cfg.train.rd_lambda == 0.01
    # JSON round-trips
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.model.activation == "gdn"
    # Context follows the MEASURED crossover table (RESULTS.md §9.1):
    # checkerboard at high rate, channel in the mid regime, joint at low
    # rate. These pins exist so a silent table edit fails a test, not a
    # user's checkpoint load.
    mid = flagship(0.03)
    assert mid.entropy.context == "channel"
    assert "channel" in mid.codec.model_id
    lo = flagship(0.1)
    assert lo.entropy.context == "joint"
    assert lo.model.activation == "gdn"
    assert "joint" in lo.codec.model_id
    assert flagship(0.019).entropy.context == "checkerboard"
    assert flagship(0.069).entropy.context == "channel"


def test_tb_subcommand(tmp_path):
    import json as _json

    from neural_network_image_compression_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    (run / "metrics.jsonl").write_text(
        _json.dumps({"loss": 0.5, "step": 1, "epoch": 0}) + "\n"
    )
    assert main(["tb", "--run", str(run)]) == 0
    import os as _os

    assert _os.path.isdir(run / "tb")

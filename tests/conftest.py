"""Test configuration: run everything on a simulated 8-device CPU mesh.

The real TPU chip is reserved for bench.py; unit/integration tests (including
the distributed ones) run on XLA:CPU with 8 virtual devices so that
pjit/shard_map logic is exercised exactly as it would be on an 8-chip slice.

Note: the environment's TPU platform plugin overrides the JAX_PLATFORMS env
var, so we must force CPU through jax.config after import.
"""
import os

# Must be set before jax initializes its backends.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def jit_forward():
    """Round-trip reference through the SAME jitted encode/decode programs
    the bitstream path uses. Tests that demand bit-exact equality between
    decompress_image output and a 'direct' forward must NOT use the eager
    ``codec.forward``: jit-vs-eager float rounding flips borderline pixels
    by one level (data-dependent — surfaced as order-dependent flakes via
    the session rng). Symbols are CRC-equal by construction, so equality
    against this reference is deterministic."""
    def f(codec, params, rgb):
        from neural_network_image_compression_tpu.coding.codec_stream import (
            jitted_codec_fns,
        )

        enc, dec = jitted_codec_fns(codec)
        sym = enc(params, rgb[None])
        return np.asarray(dec(params, sym, out_hw=rgb.shape[:2]))[0]

    return f

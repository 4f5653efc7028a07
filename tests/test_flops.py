"""Analytic FLOP accounting sanity (utils/flops.py)."""
import numpy as np

from neural_network_image_compression_tpu.utils.flops import (
    chip_peak_tflops,
    plane_flops,
    round_trip_flops,
)


def test_base_round_trip_flops_value():
    # Hand-computed for 512x768 (see utils/flops.py conventions):
    # analysis/plane = 6.93 GF, synthesis/plane = 9.60 GF, x3 planes.
    total = round_trip_flops("base", 512, 768)
    assert 45e9 < total < 55e9, total
    a, s = plane_flops("base", 512, 768)
    assert s > a  # decoder's stride-2 convT at 128x192 dominates


def test_flops_scale_linearly_with_area():
    one = round_trip_flops("base", 256, 256)
    four = round_trip_flops("base", 512, 512)
    np.testing.assert_allclose(four / one, 4.0, rtol=0.02)


def test_deep_preset_has_more_flops():
    assert round_trip_flops("deep", 512, 768) > round_trip_flops("base", 512, 768)


def test_chip_peak_lookup():
    assert chip_peak_tflops("TPU v5e") == 197.0
    assert chip_peak_tflops("TPU v5 lite") == 197.0
    assert chip_peak_tflops("TPU v4") == 275.0
    assert chip_peak_tflops("TPU v6e") == 918.0
    assert chip_peak_tflops("weird accelerator") is None


def test_hbm_bytes_scaling():
    from neural_network_image_compression_tpu.utils.flops import (
        round_trip_hbm_bytes,
    )

    b = round_trip_hbm_bytes("base", 512, 768)
    assert b > 0
    # linear in pixel count (all layer sizes scale with the image area)
    assert abs(round_trip_hbm_bytes("base", 1024, 768) / b - 2.0) < 0.01
    # f32 moves twice the bytes of bf16
    assert round_trip_hbm_bytes("base", 512, 768, itemsize=4) == 2 * b
    # the deep preset adds stride-1 stages -> strictly more traffic
    assert round_trip_hbm_bytes("deep", 512, 768) > b

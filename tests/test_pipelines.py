"""Directory compress/decompress pipeline tests (reference parity paths)."""
import dataclasses
import os

import jax
import numpy as np
import pytest
from PIL import Image

from neural_network_image_compression_tpu.config import CodecConfig, Config
from neural_network_image_compression_tpu.evaluation import (
    compress_directory,
    decompress_directory,
)
from neural_network_image_compression_tpu.models import NeuralCodec


@pytest.fixture(scope="module")
def png_codec():
    cfg = Config(codec=CodecConfig(bitstream="png"))
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    return codec, params


def _write_images(d, shapes):
    rng = np.random.default_rng(0)
    os.makedirs(d, exist_ok=True)
    for i, (h, w) in enumerate(shapes):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"img{i}.png"))


def test_png_mode_round_trip_recovers_original_shapes(png_codec, tmp_path):
    """VERDICT r1 item 7: compress dir (png mode) -> decompress dir ->
    output shapes equal the originals, with NO caller-supplied sidecar —
    padded size is inferred from the packed shape (reference
    tf2_0/src/utils.py:35-36) and cropped via the auto-written side table."""
    codec, params = png_codec
    src = str(tmp_path / "src")
    # 64x64 (downsample multiple) and 50x70 (odd, exercises pad+crop)
    _write_images(src, [(64, 64), (50, 70)])
    comp = str(tmp_path / "comp")
    compress_directory(codec, params, src, comp)
    out = str(tmp_path / "out")
    decompress_directory(codec, params, comp, out)
    for i, (h, w) in enumerate([(64, 64), (50, 70)]):
        got = np.asarray(Image.open(os.path.join(out, f"img{i}.png")))
        assert got.shape == (h, w, 3)


def test_png_mode_without_side_table_emits_padded_size(png_codec, tmp_path):
    """Without shapes.json (foreign/reference-produced bitstream dir) the
    decoder behaves exactly like the reference: padded size from the packed
    shape."""
    codec, params = png_codec
    src = str(tmp_path / "src")
    _write_images(src, [(50, 70)])
    comp = str(tmp_path / "comp")
    compress_directory(codec, params, src, comp)
    os.remove(os.path.join(comp, "shapes.json"))
    out = str(tmp_path / "out")
    decompress_directory(codec, params, comp, out)
    got = np.asarray(Image.open(os.path.join(out, "img0.png")))
    assert got.shape == (56, 72, 3)  # 50->56, 70->72 (multiples of 8)


def test_rans_mode_directory_round_trip(tmp_path):
    cfg = Config()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    src = str(tmp_path / "src")
    _write_images(src, [(48, 64)])
    comp = str(tmp_path / "comp")
    compress_directory(codec, params, src, comp)
    assert os.path.exists(os.path.join(comp, "img0.nic"))
    out = str(tmp_path / "out")
    decompress_directory(codec, params, comp, out)
    got = np.asarray(Image.open(os.path.join(out, "img0.png")))
    direct = np.asarray(
        codec.decode(
            params,
            codec.encode(params, np.asarray(Image.open(os.path.join(src, "img0.png")))[None]),
            out_hw=(48, 64),
        )
    )[0]
    np.testing.assert_array_equal(got, direct)


def test_rd_point_batched_matches_serial(tmp_path):
    """The batched/jitted driver must reproduce the serial rd_point numbers
    (same rates — identical containers — and same metrics)."""
    from neural_network_image_compression_tpu.evaluation import (
        rd_point,
        rd_point_batched,
    )

    cfg = Config()
    codec = NeuralCodec(cfg)
    params = codec.init(jax.random.key(0))
    src = str(tmp_path / "src")
    _write_images(src, [(48, 64), (48, 64), (48, 64), (32, 40)])
    serial = rd_point(codec, params, src)
    batched = rd_point_batched(codec, params, src, batch_size=2)
    assert len(serial["files"]) == len(batched["files"]) == 4
    s = {r.name: r for r in serial["files"]}
    b = {r.name: r for r in batched["files"]}
    for name in s:
        assert s[name].num_bytes == b[name].num_bytes, name
        np.testing.assert_allclose(s[name].psnr, b[name].psnr, rtol=1e-5)
        np.testing.assert_allclose(s[name].ms_ssim, b[name].ms_ssim, rtol=1e-5)


def test_rd_point_batched_sharded_over_mesh(tmp_path):
    """File-level sharding (SURVEY.md 2b): images scattered over the mesh's
    data axis produce the same results as unsharded."""
    import jax as _jax
    from jax.sharding import Mesh

    from neural_network_image_compression_tpu.evaluation import rd_point_batched

    cfg = Config()
    codec = NeuralCodec(cfg)
    params = codec.init(_jax.random.key(0))
    src = str(tmp_path / "src")
    _write_images(src, [(48, 64)] * 5)  # 5 images, 4-device axis: pad path
    devs = np.array(_jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    plain = rd_point_batched(codec, params, src, batch_size=8)
    sharded = rd_point_batched(codec, params, src, batch_size=8, mesh=mesh)
    assert len(sharded["files"]) == 5
    np.testing.assert_allclose(sharded["mean_bpp"], plain["mean_bpp"], rtol=1e-6)
    np.testing.assert_allclose(sharded["mean_psnr"], plain["mean_psnr"], rtol=1e-4)

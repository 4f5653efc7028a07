"""Auxiliary subsystems: diagnostics, run dirs, builder, anchors, config,
IO, PNG proxy."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from neural_network_image_compression_tpu.config import Config, reference_faithful
from neural_network_image_compression_tpu.data.builder import build_patches
from neural_network_image_compression_tpu.data.io import (
    iter_batches,
    list_images,
    load_image,
    png_num_bytes,
    read_dataset,
    save_png,
)
from neural_network_image_compression_tpu.evaluation.anchors import (
    jpeg_rd_curve,
    png_rate,
)
from neural_network_image_compression_tpu.ops.png_proxy import png_bpp
from neural_network_image_compression_tpu.utils import (
    discrete_entropy,
    next_run_dir,
    side_by_side,
)


def _write_images(d, n=4, size=(32, 32), gray=0):
    rng = np.random.default_rng(7)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img{i}.png"))
    for i in range(gray):
        arr = rng.integers(0, 256, size, dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"gray{i}.png"))


class TestDiagnostics:
    def test_discrete_entropy_uniform(self):
        # all 256 symbols equally likely -> 8 bits
        lat = jnp.asarray(np.tile(np.arange(256) / 255.0, 16)[None].astype(np.float32))
        ent = float(discrete_entropy(lat)[0])
        assert abs(ent - 8.0) < 1e-3

    def test_discrete_entropy_constant(self):
        lat = jnp.full((2, 100), 0.5)
        ent = np.asarray(discrete_entropy(lat))
        np.testing.assert_allclose(ent, 0.0, atol=1e-6)

    def test_side_by_side_shape(self):
        a = np.zeros((16, 20, 3), np.uint8)
        s = side_by_side(a, a)
        assert s.shape == (16, 48, 3)


class TestRunDirs:
    def test_autonumber(self, tmp_path):
        base = str(tmp_path)
        d1 = next_run_dir(base)
        assert d1.endswith("run1")
        os.makedirs(d1)
        os.makedirs(os.path.join(base, "run7"))
        assert next_run_dir(base).endswith("run8")


class TestBuilder:
    def test_build_patches(self, tmp_path):
        src = str(tmp_path / "src")
        _write_images(src, n=6, size=(64, 48))
        # one flat image that must be rejected by the std filter
        Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(
            os.path.join(src, "flat.png")
        )
        out = str(tmp_path / "patches")
        n = build_patches(src, out, patch_size=16, workers=1)
        assert n == 6
        names = sorted(os.listdir(out))
        assert names == [f"{i:05d}.jpg" for i in range(6)]
        arr = load_image(os.path.join(out, names[0]))
        assert arr.shape == (16, 16, 3)


class TestAnchors:
    def test_jpeg_curve_monotone_rate(self, tmp_path):
        d = str(tmp_path / "imgs")
        _write_images(d, n=2, size=(64, 64))
        pts = jpeg_rd_curve(d, qualities=(10, 90))
        assert pts[0]["bpp"] < pts[1]["bpp"]
        assert all(np.isfinite(p["psnr"]) for p in pts)
        png = png_rate(d)
        assert png["bpp"] > pts[1]["bpp"]  # lossless costs more than JPEG q90


class TestConfig:
    def test_json_round_trip(self):
        cfg = reference_faithful()
        cfg2 = Config.from_json(cfg.to_json())
        assert cfg2 == cfg
        assert cfg2.entropy.kind == "regressor"
        assert cfg2.train.chroma_lambda == 0.01

    def test_default_config_values_match_reference(self):
        cfg = Config()
        assert cfg.train.learning_rate == 1e-4  # tf2_0/src/training.py:56
        assert cfg.train.batch_size == 64       # tf2_0/src/training.py:179
        assert cfg.train.rd_lambda == 0.01
        assert cfg.model.downsample == 8


class TestIO:
    def test_read_dataset_skips_grayscale(self, tmp_path):
        d = str(tmp_path / "mix")
        _write_images(d, n=3, gray=2)
        images, stems = read_dataset(d)
        assert isinstance(images, np.ndarray) and len(images) == 3
        assert all(s.startswith("img") for s in stems)

    def test_read_dataset_ragged(self, tmp_path):
        d = str(tmp_path / "ragged")
        _write_images(d, n=1, size=(32, 32))
        rng = np.random.default_rng(0)
        Image.fromarray(
            rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
        ).save(os.path.join(d, "other.png"))
        images, stems = read_dataset(d)
        assert isinstance(images, list) and len(images) == 2
        batches = list(iter_batches(images, stems, batch_size=4))
        assert len(batches) == 2 and batches[0][0].shape[0] == 1

    def test_save_png_rejects_non_integer(self, tmp_path):
        with pytest.raises(ValueError):
            save_png(np.full((4, 4), 0.5), str(tmp_path / "x.png"))


class TestPngProxy:
    def test_png_bpp_matches_host_encoder(self, rng):
        lat = jnp.asarray(rng.random((2, 8, 8, 32)).astype(np.float32))
        bpp = np.asarray(png_bpp(lat, 64 * 64))
        assert bpp.shape == (2, 1)
        # recompute by hand
        sym = np.round(np.asarray(lat) * 255).astype(np.uint8)
        for i in range(2):
            packed = sym[i].reshape(32, 64, 1)
            expected = 8.0 * png_num_bytes(packed) / (64 * 64)
            assert abs(bpp[i, 0] - expected) < 1e-5


class TestTensorboard:
    """utils/tensorboard.py: zero-dep event files readable by the REAL
    TensorBoard reader (capability parity with reference
    tf1_13/src/training.py:163-164 scalar summaries)."""

    def test_event_file_read_back_by_tensorboard(self, tmp_path):
        from neural_network_image_compression_tpu.utils.tensorboard import (
            SummaryWriter,
        )

        w = SummaryWriter(str(tmp_path))
        w.scalars(1, {"loss": 0.5, "bpp_y": 1.25})
        w.scalars(2, {"loss": 0.25, "skipme": "str"})
        w.close()
        ea = pytest.importorskip(
            "tensorboard.backend.event_processing.event_accumulator"
        )
        acc = ea.EventAccumulator(str(tmp_path))
        acc.Reload()
        assert set(acc.Tags()["scalars"]) == {"loss", "bpp_y"}
        assert [(e.step, e.value) for e in acc.Scalars("loss")] == [
            (1, 0.5),
            (2, 0.25),
        ]

    def test_convert_jsonl(self, tmp_path):
        from neural_network_image_compression_tpu.utils.tensorboard import (
            convert_jsonl,
        )

        p = tmp_path / "metrics.jsonl"
        p.write_text(
            json.dumps({"loss": 1.0, "step": 5, "epoch": 0}) + "\n"
            + json.dumps(
                {"kind": "validation", "mean_bpp": 2.0, "step": 5, "epoch": 0}
            ) + "\n"
        )
        path = convert_jsonl(str(p))
        assert os.path.exists(path)
        ea = pytest.importorskip(
            "tensorboard.backend.event_processing.event_accumulator"
        )
        acc = ea.EventAccumulator(os.path.dirname(path))
        acc.Reload()
        assert "train/loss" in acc.Tags()["scalars"]
        assert "val/mean_bpp" in acc.Tags()["scalars"]

    def test_crc32c_known_vectors(self):
        from neural_network_image_compression_tpu.utils.tensorboard import crc32c

        # RFC 3720 / kernel test vectors
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0


class TestMosaicDataset:
    def test_mosaic_tiling_layout_and_epoch_length(self):
        from neural_network_image_compression_tpu.data.pipeline import (
            PatchDataset,
        )

        imgs = np.arange(32 * 8 * 8 * 3, dtype=np.uint8).reshape(32, 8, 8, 3)
        ds = PatchDataset(imgs, batch_size=2, seed=1, mosaic=2)
        assert len(ds) == 4  # 32 patches / (2 per batch * 4 per mosaic)
        b = next(iter(ds.epoch(0)))
        assert b.shape == (2, 16, 16, 3)
        rng = np.random.default_rng((1, 0))
        order = rng.permutation(32)
        # Each 8x8 tile is one source patch verbatim, row-major per element.
        np.testing.assert_array_equal(b[0, :8, :8], imgs[order[0]])
        np.testing.assert_array_equal(b[0, :8, 8:], imgs[order[1]])
        np.testing.assert_array_equal(b[0, 8:, :8], imgs[order[2]])
        np.testing.assert_array_equal(b[1, :8, :8], imgs[order[4]])

    def test_mosaic_one_is_identity(self):
        from neural_network_image_compression_tpu.data.pipeline import (
            PatchDataset,
        )

        imgs = np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3)
        a = list(PatchDataset(imgs, 4, seed=0).epoch(0))
        b = list(PatchDataset(imgs, 4, seed=0, mosaic=1).epoch(0))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestUrlBuilder:
    """build_patches_from_urls: the reference's ImageNet crawl path
    (imagenet_download.ipynb cells 3,7-8) exercised with file:// URLs."""

    def test_crawl_file_urls(self, tmp_path):
        from neural_network_image_compression_tpu.data.builder import (
            build_patches_from_urls,
        )

        src = tmp_path / "src"
        src.mkdir()
        rng = np.random.default_rng(0)
        good = []
        for i in range(6):
            p = src / f"img{i}.png"
            Image.fromarray(
                rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
            ).save(p)
            good.append(f"n{i:03d}\tfile://{p}")
        flat = src / "flat.png"
        Image.fromarray(np.full((64, 48, 3), 7, np.uint8)).save(flat)
        lines = good + [
            f"nflat\tfile://{flat}",            # rejected: std <= 20
            "ndead\tfile:///nonexistent.png",   # swallowed error (cell 7)
            "",                                   # blank line skipped
            f"file://{src / 'img0.png'}",       # bare-URL line format
        ]
        url_file = tmp_path / "urls.txt"
        url_file.write_text("\n".join(lines))
        out = tmp_path / "out"
        n = build_patches_from_urls(
            str(url_file), str(out), patch_size=16, workers=1, seed=3
        )
        assert n == 7  # 6 textured + 1 bare-url duplicate; flat+dead dropped
        names = sorted(os.listdir(out))
        assert names == [f"{i:05d}.jpg" for i in range(7)]
        for name in names:
            with Image.open(out / name) as im:
                assert im.size == (16, 16)

    def test_crawl_respects_limit(self, tmp_path):
        from neural_network_image_compression_tpu.data.builder import (
            build_patches_from_urls,
        )

        src = tmp_path / "src"
        src.mkdir()
        rng = np.random.default_rng(1)
        urls = []
        for i in range(8):
            p = src / f"{i}.png"
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(p)
            urls.append(f"file://{p}")
        url_file = tmp_path / "urls.txt"
        url_file.write_text("\n".join(urls))
        out = tmp_path / "out"
        n = build_patches_from_urls(
            str(url_file), str(out), patch_size=8, workers=1, limit=3
        )
        assert n == 3
        assert sorted(os.listdir(out)) == ["00000.jpg", "00001.jpg", "00002.jpg"]

"""Training input pipeline.

The reference loads the entire 19k x 128x128x3 patch set into one RAM ndarray
and iterates ``tf.data.from_tensor_slices(...).shuffle(10000).batch(64)``
(reference tf2_0/src/training.py:60). We keep the same in-RAM design (the set
is ~930 MB as uint8) but make the iterator deterministic-by-seed, epoch-aware,
and device-put-ahead: batches are transferred to device (sharded over the data
axis of the mesh when one is provided) while the previous step computes.
"""
from __future__ import annotations

import collections
from typing import Iterator

import jax
import numpy as np


class PatchDataset:
    """Uniform-shaped uint8 patch set with shuffled batch iteration.

    ``mosaic=G`` (G>1) tiles each batch element from a GxG grid of randomly
    drawn patches, producing (G*H)x(G*W) training images from HxW patches.
    This is the larger-training-crop lever for hyper-side entropy models:
    conditionals trained only on 128x128 patch statistics overfit them and
    pay on Kodak-scale images (RESULTS.md §7.2); 256/512-pixel mosaics give
    the hyper/joint context nets large-image statistics to fit without any
    new data. An epoch still consumes each patch exactly once.
    """

    def __init__(self, images: np.ndarray, batch_size: int, seed: int = 0,
                 drop_remainder: bool = True, mosaic: int = 1):
        if images.ndim != 4:
            raise ValueError(f"expected [N,H,W,C], got {images.shape}")
        self.images = images
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.drop_remainder = drop_remainder
        self.mosaic = int(mosaic)
        if self.mosaic < 1:
            raise ValueError(f"mosaic must be >= 1, got {mosaic}")

    @property
    def _patches_per_item(self) -> int:
        return self.mosaic * self.mosaic

    def __len__(self) -> int:
        n = len(self.images) // self._patches_per_item
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterator[np.ndarray]:
        """Deterministic shuffled pass over the data for a given epoch."""
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(len(self.images))
        n_batches = len(self)
        per = self.batch_size * self._patches_per_item
        g = self.mosaic
        for b in range(n_batches):
            idx = order[b * per : (b + 1) * per]
            batch = self.images[idx]
            if g > 1:
                n, h, w, c = self.batch_size, *batch.shape[1:]
                # [B, gh, gw, H, W, C] -> [B, gh*H, gw*W, C]
                batch = (
                    batch.reshape(n, g, g, h, w, c)
                    .transpose(0, 1, 3, 2, 4, 5)
                    .reshape(n, g * h, g * w, c)
                )
            yield batch

    def device_epoch(
        self, epoch_idx: int, sharding=None, prefetch: int = 2
    ) -> Iterator[jax.Array]:
        """Epoch iterator that keeps ``prefetch`` batches in flight on device.

        Multi-host (jax.process_count() > 1): every process iterates the SAME
        deterministic global permutation, and each builds its global array
        from per-shard callbacks — the sharding maps each global batch row to
        its owning device, so a host only materializes on-device the rows of
        its addressable shards (DCN never carries training data)."""
        multiprocess = sharding is not None and jax.process_count() > 1

        def put(batch):
            if multiprocess:
                return jax.make_array_from_callback(
                    batch.shape, sharding, lambda idx: batch[idx]
                )
            return jax.device_put(batch, sharding)

        queue: collections.deque[jax.Array] = collections.deque()
        for batch in self.epoch(epoch_idx):
            queue.append(put(batch))
            if len(queue) > prefetch:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

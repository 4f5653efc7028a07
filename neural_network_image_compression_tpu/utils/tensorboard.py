"""Minimal TensorBoard event-file writer (zero dependencies).

Capability parity with the reference's scalar summaries: tf1_13 logs
mean_expected_size / entropy losses / SSIM / loss to TensorBoard
(reference tf1_13/src/training.py:78,94,103,131; writer constructed at
:163-164, auto-numbered run dirs via utils.py:106-110). This framework's
primary metrics sink is ``metrics.jsonl`` (machine-readable, append-only);
this module emits the same scalars as standard TensorBoard event files so
the usual dashboards work, without importing TF or torch into the trainer.

Format notes (stable since TF 1.x):
- An events file is a sequence of length-prefixed records:
  ``uint64 length | uint32 masked_crc32c(length) | bytes data |
  uint32 masked_crc32c(data)`` (TFRecord framing).
- Each record is a serialized ``tensorflow.Event`` protobuf. We hand-encode
  the three fields we need — wall_time (double, field 1), step (int64,
  field 2), summary (message, field 5) with Summary.value entries carrying
  tag (field 1) + simple_value (float, field 2).
- CRC is CRC-32C (Castagnoli), masked per TFRecord convention.

Validated against the real reader in tests/test_aux.py
(tensorboard.backend.event_processing.event_accumulator).
"""
from __future__ import annotations

import os
import socket
import struct
import time


def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- protobuf primitives


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _f_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _f_int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _f_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _event(wall_time: float, step: int, body: bytes = b"") -> bytes:
    return _f_double(1, wall_time) + _f_int64(2, step) + body


def _scalar_summary(scalars: dict[str, float]) -> bytes:
    values = b""
    for tag, v in scalars.items():
        entry = _f_bytes(1, tag.encode()) + _f_float(2, float(v))
        values += _f_bytes(1, entry)  # Summary.value (repeated, field 1)
    return _f_bytes(5, values)  # Event.summary (field 5)


class SummaryWriter:
    """Append-only scalar event writer for one run directory.

    Usage::

        w = SummaryWriter(run_dir)
        w.scalars(step, {"loss": 0.1, "bpp_y": 1.5})
        w.close()
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = (
            f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        )
        self.path = os.path.join(logdir, fname)
        self._f = open(self.path, "ab")
        # Conventional first record: a file-version event.
        self._write(_event(time.time(), 0, _f_bytes(3, b"brain.Event:2")))

    def _write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", _masked_crc(record)))
        self._f.flush()

    def scalars(
        self, step: int, values: dict[str, float], wall_time: float | None = None
    ) -> None:
        numeric = {
            k: v for k, v in values.items() if isinstance(v, (int, float))
        }
        if not numeric:
            return
        self._write(
            _event(
                wall_time if wall_time is not None else time.time(),
                int(step),
                _scalar_summary(numeric),
            )
        )

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()

    def __enter__(self) -> "SummaryWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def convert_jsonl(metrics_path: str, logdir: str | None = None) -> str:
    """metrics.jsonl -> TensorBoard event file. Train records become
    ``train/<key>`` scalars at their step; validation records become
    ``val/<key>``. Returns the event file path."""
    import json

    if logdir is None:
        logdir = os.path.join(os.path.dirname(metrics_path), "tb")
    with SummaryWriter(logdir) as w:
        with open(metrics_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                step = int(rec.get("step", 0))
                kind = rec.get("kind")
                prefix = "val" if kind == "validation" else "train"
                scalars = {
                    f"{prefix}/{k}": v
                    for k, v in rec.items()
                    if isinstance(v, (int, float)) and not isinstance(v, bool)
                    and k not in ("step", "epoch")
                }
                w.scalars(step, scalars, wall_time=rec.get("wall"))
        return w.path

"""Glue between the neural codec and the entropy-coded bitstream.

Replaces the reference's compress/uncompress file pipelines' PNG write/read
(reference tf2_0/src/encoder.py:49-51, decoder.py:50-52) with: analysis ->
quantize -> per-plane rANS streams -> container bytes, and the exact inverse.
The latent round-trip is bit-exact (tested), so decompress(compress(x)) equals
the direct forward path symbol-for-symbol.
"""
from __future__ import annotations

import numpy as np

from neural_network_image_compression_tpu.coding import cdf as cdf_mod
from neural_network_image_compression_tpu.coding import rans
from neural_network_image_compression_tpu.coding.container import (
    ContainerHeader,
    pack_container,
    unpack_container,
)


def build_tables(codec, params, precision: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Quantized CDF tables (cdf_y, cdf_c) from the codec's factorized model."""
    if precision is None:
        precision = codec.cfg.entropy.cdf_precision
    pmf_y, pmf_c = codec.pmf_tables(params)
    return (
        cdf_mod.quantize_pmf(np.asarray(pmf_y), precision),
        cdf_mod.quantize_pmf(np.asarray(pmf_c), precision),
    )


def encode_latent(
    sym: np.ndarray, cdf_y: np.ndarray, cdf_c: np.ndarray, precision: int = 16
) -> list[bytes]:
    """[h,w,3C] uint8 symbols -> 3 independent plane streams [Y, Cb, Cr]."""
    cch = cdf_y.shape[0]
    streams = []
    for p, table in enumerate((cdf_y, cdf_c, cdf_c)):
        plane = np.ascontiguousarray(sym[..., p * cch : (p + 1) * cch])
        streams.append(rans.encode(plane, table, precision))
    return streams


def decode_latent(
    streams: list[bytes],
    lat_hw: tuple[int, int],
    cdf_y: np.ndarray,
    cdf_c: np.ndarray,
    precision: int = 16,
) -> np.ndarray:
    """Inverse of :func:`encode_latent` -> [h,w,3C] uint8 symbols."""
    h, w = lat_hw
    cch = cdf_y.shape[0]
    planes = []
    for p, table in enumerate((cdf_y, cdf_c, cdf_c)):
        flat = rans.decode(streams[p], h * w * cch, table, precision)
        planes.append(flat.reshape(h, w, cch))
    return np.concatenate(planes, axis=-1)


def compress_image(codec, params, rgb_u8: np.ndarray, tables=None,
                   password: str | None = None) -> bytes:
    """uint8 [H,W,3] -> container bytes (header + 3 rANS plane streams).
    With ``password``, the container is wrapped in the authenticated stream
    cipher from coding/crypto.py (the reference's advertised-but-missing
    encryption capability)."""
    if tables is None:
        tables = build_tables(codec, params)
    cdf_y, cdf_c = tables
    precision = codec.cfg.entropy.cdf_precision
    sym = np.asarray(codec.encode(params, rgb_u8[None]))[0]
    streams = encode_latent(sym, cdf_y, cdf_c, precision)
    header = ContainerHeader(
        model_id=codec.cfg.codec.model_id,
        colorspace=codec.colorspace.name,
        levels=codec.levels,
        latent_channels=codec.latent_channels,
        orig_h=rgb_u8.shape[0],
        orig_w=rgb_u8.shape[1],
        lat_h=sym.shape[0],
        lat_w=sym.shape[1],
    )
    blob = pack_container(header, streams)
    if password is not None:
        from neural_network_image_compression_tpu.coding.crypto import encrypt

        blob = encrypt(blob, password)
    return blob


def decompress_image(codec, params, data: bytes, tables=None,
                     password: str | None = None) -> np.ndarray:
    """Container bytes -> uint8 [H,W,3] reconstruction."""
    from neural_network_image_compression_tpu.coding.crypto import decrypt, is_encrypted

    if is_encrypted(data):
        if password is None:
            raise ValueError("container is encrypted; password required")
        data = decrypt(data, password)
    header, streams = unpack_container(data)
    if tables is None:
        tables = build_tables(codec, params)
    cdf_y, cdf_c = tables
    precision = codec.cfg.entropy.cdf_precision
    sym = decode_latent(
        streams, (header.lat_h, header.lat_w), cdf_y, cdf_c, precision
    )
    rgb = codec.decode(params, sym[None], out_hw=(header.orig_h, header.orig_w))
    return np.asarray(rgb)[0]

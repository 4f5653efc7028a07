"""Spatial tile parallelism with halo exchange.

Large-image inference sharded across chips: the image is split into
width-tiles over the mesh's ``spatial`` axis; each chip encodes its tile
after receiving a halo of boundary columns from its neighbours via
``lax.ppermute`` (ICI collective-permute). The result is **identical to the
whole-image computation** — the halo replaces the SAME-padding zeros that
would otherwise corrupt interior tile boundaries, and global edges still see
zeros (ppermute leaves non-received buffers zero), exactly like whole-image
SAME padding. Tile-count invariance is asserted in tests.

Why this works (receptive-field argument): a latent column depends on at
most R input columns on each side, where R is the conv stack's receptive
half-width (base preset: R = 22 input px for analysis). With a halo of
``halo >= R`` columns of *real* neighbour data (rounded up to a multiple of
the downsample factor so the stride phase is preserved), every kept latent
column sees the same window of values as in the whole-image pass. The tiled
and whole-image passes are mathematically identical, but XLA may fuse the
float reductions in a different order per tiling, so quantized symbols can
differ by <=1 level at a handful of positions (tests/test_parallel.py
gates at <=2 single-level flips); for guaranteed-identical bitstreams use
``codec.deterministic`` fixed-point coding-side inference.

The reference has no analogue — it always runs whole images on one device
(reference tf2_0/src/utils.py:30-44); its SAME-padded stride-2 convs
(tf2_0/src/encoder.py:10-17) are what define the halo widths here.
SURVEY.md section 2b names this the moral equivalent of context/sequence
parallelism for the attention-free conv workload.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from neural_network_image_compression_tpu.ops import colorspace as cspace
from neural_network_image_compression_tpu.ops.quantize import dequantize, quantize

# Analysis receptive half-width in input pixels (base preset: three stride-2
# 5x5 convs + two 3x3 convs -> R = 22), rounded up to a multiple of the
# downsample factor 8. The deep preset (four stride-2 stages) needs more.
ENCODE_HALO = {"base": 24, "deep": 56}
# Synthesis receptive half-width in latent columns (transposed convs).
DECODE_HALO = {"base": 4, "deep": 6}


def _halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, n: int,
                   axis: int) -> jnp.ndarray:
    """Concatenate neighbours' boundary slices along ``axis`` (1=H rows,
    2=W columns): [N,H,W,C] -> [N,H+2h,W,C] or [N,H,W+2h,C].

    Tiles at the global edges receive zeros (ppermute semantics), matching
    whole-image SAME zero padding. For 2-D tiling, exchange W first and then
    H on the W-extended array — the row halos then carry the corner regions
    too, so diagonal neighbours need no extra exchange.
    """
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    lo[axis] = slice(None, halo)
    hi[axis] = slice(-halo, None)
    if n == 1:
        shape = list(x.shape)
        shape[axis] = halo
        zeros = jnp.zeros(shape, x.dtype)
        return jnp.concatenate([zeros, x, zeros], axis=axis)
    # tile i sends its LOW slice to tile i-1 (becomes i-1's high halo)
    high_halo = jax.lax.ppermute(
        x[tuple(lo)], axis_name, [(i, i - 1) for i in range(1, n)]
    )
    # tile i sends its HIGH slice to tile i+1 (becomes i+1's low halo)
    low_halo = jax.lax.ppermute(
        x[tuple(hi)], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    return jnp.concatenate([low_halo, x, high_halo], axis=axis)


def _halo_exchange_w(x: jnp.ndarray, halo: int, axis_name: str, n: int) -> jnp.ndarray:
    """Width-axis halo exchange: [N,H,W,C] -> [N,H,W+2h,C]."""
    return _halo_exchange(x, halo, axis_name, n, axis=2)


def _edge_mask(axis_name: str, halo: int, local_w: int, global_w: int,
               upsample: bool):
    """Per-stage column mask re-imposing whole-image SAME-padding zeros.

    At every transform stage, columns of the halo-extended tile that map
    beyond the global image boundary must be EXACTLY zero (whole-image SAME
    padding inserts fresh zeros at each stage; without this, conv bias +
    activation turn the zero halo into nonzero garbage at depth >= 2 and edge
    tiles diverge). Interior tiles keep everything (mask all-True) — the same
    SPMD program runs everywhere, only ``axis_index`` differs.
    """

    idx = jax.lax.axis_index(axis_name)

    def mask(x: jnp.ndarray, scale: int) -> jnp.ndarray:
        w = x.shape[2]
        if upsample:
            off = (idx * local_w - halo) * scale
            gmax = global_w * scale
        else:
            off = (idx * local_w - halo) // scale
            gmax = global_w // scale
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2) + off
        keep = (cols >= 0) & (cols < gmax)
        return jnp.where(keep, x, jnp.zeros_like(x))

    return mask


def tiled_encode(codec, params, rgb_u8: jnp.ndarray, mesh: Mesh,
                 halo: int | None = None, valid_w: int | None = None) -> jnp.ndarray:
    """Whole-image-equivalent encode with the width axis sharded over the
    mesh's ``spatial`` axis. rgb_u8: [N,H,W,3], W divisible by
    (spatial * downsample). Returns uint8 symbols [N,h,w,3C] (sharded on w).

    ``valid_w`` (multiple of ds, default W): the logical image width. When the
    physical array is zero-padded past ``valid_w`` to reach a tile multiple,
    the per-stage mask treats ``valid_w`` as the global image edge, so columns
    [0, valid_w/ds) of the result are bit-identical to a whole-image encode of
    width ``valid_w``; columns beyond are zeros.
    """
    ds = codec.downsample
    if halo is None:
        halo = ENCODE_HALO[codec.cfg.model.preset]
    halo = -(-halo // ds) * ds  # round up to stride-phase-preserving multiple
    n_sp = mesh.shape["spatial"]
    w = rgb_u8.shape[2]
    if valid_w is None:
        valid_w = w
    if w % (n_sp * ds) or valid_w % ds:
        raise ValueError(f"width {w} not divisible by spatial*ds = {n_sp * ds}")
    local_w = w // n_sp

    def fn(p, tile_u8):
        x = tile_u8.astype(jnp.float32) / 255.0
        planes = cspace.rgb_to_planes(x, codec.colorspace)
        # Zero any physical-padding columns beyond valid_w before the exchange.
        idx = jax.lax.axis_index("spatial")
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, local_w, 1), 2)
        planes = jnp.where(cols + idx * local_w < valid_w, planes, 0.0)
        mask = _edge_mask("spatial", halo, local_w, valid_w, upsample=False)
        ext = _halo_exchange_w(planes, halo, "spatial", n_sp)
        lat = codec.encode_planes(p, ext, column_mask=mask)
        crop = halo // ds
        lat = lat[:, :, crop : lat.shape[2] - crop]
        return quantize(lat, codec.levels, codec.grid)

    return jax.shard_map(
        fn,
        mesh=mesh,
        check_vma=False,  # pallas_call inside shard_map needs vma checking off
        in_specs=(P(), P(None, None, "spatial", None)),
        out_specs=P(None, None, "spatial", None),
    )(params, rgb_u8)


def tiled_decode(codec, params, sym_u8: jnp.ndarray, mesh: Mesh,
                 halo: int | None = None, valid_w: int | None = None) -> jnp.ndarray:
    """Inverse of :func:`tiled_encode`: latent symbols sharded on w ->
    uint8 RGB sharded on W, identical to the whole-image decode.

    ``valid_w`` is in latent columns (default: full width); symbols past it
    must be zero-padding and are masked out of the computation."""
    ds = codec.downsample
    if halo is None:
        halo = DECODE_HALO[codec.cfg.model.preset]
    n_sp = mesh.shape["spatial"]
    lat_w = sym_u8.shape[2]
    if valid_w is None:
        valid_w = lat_w
    if lat_w % n_sp:
        raise ValueError("latent width not divisible by spatial axis")
    local_w = lat_w // n_sp

    def fn(p, tile_sym):
        lat = dequantize(tile_sym, codec.levels, codec.grid)
        idx = jax.lax.axis_index("spatial")
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, local_w, 1), 2)
        lat = jnp.where(cols + idx * local_w < valid_w, lat, 0.0)
        ext = _halo_exchange_w(lat, halo, "spatial", n_sp)
        mask = _edge_mask("spatial", halo, local_w, valid_w, upsample=True)
        planes = codec.decode_planes(p, ext, column_mask=mask)
        crop = halo * ds
        planes = planes[:, :, crop : planes.shape[2] - crop]
        rgb = jnp.clip(cspace.planes_to_rgb(planes, codec.colorspace), 0.0, 1.0)
        return jnp.round(rgb * 255.0).astype(jnp.uint8)

    return jax.shard_map(
        fn,
        mesh=mesh,
        check_vma=False,  # pallas_call inside shard_map needs vma checking off
        in_specs=(P(), P(None, None, "spatial", None)),
        out_specs=P(None, None, "spatial", None),
    )(params, sym_u8)


# ------------------------------------------------------------- 2-D tiling


def _edge_mask_2d(halo_h: int, local_h: int, global_h: int,
                  halo_w: int, local_w: int, global_w: int, upsample: bool):
    """Per-stage H x W mask re-imposing whole-image SAME-padding zeros on
    both axes (the 2-D generalization of :func:`_edge_mask`; same SPMD
    program on every tile, only the axis indices differ)."""
    idx_h = jax.lax.axis_index("sph")
    idx_w = jax.lax.axis_index("spw")

    def mask(x: jnp.ndarray, scale: int) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        if upsample:
            off_h = (idx_h * local_h - halo_h) * scale
            off_w = (idx_w * local_w - halo_w) * scale
            gmax_h, gmax_w = global_h * scale, global_w * scale
        else:
            off_h = (idx_h * local_h - halo_h) // scale
            off_w = (idx_w * local_w - halo_w) // scale
            gmax_h, gmax_w = global_h // scale, global_w // scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1) + off_h
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2) + off_w
        keep = (rows >= 0) & (rows < gmax_h) & (cols >= 0) & (cols < gmax_w)
        return jnp.where(keep, x, jnp.zeros_like(x))

    return mask


def tiled_encode_2d(codec, params, rgb_u8: jnp.ndarray, mesh: Mesh,
                    halo: int | None = None,
                    valid_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Whole-image-equivalent encode with H sharded over mesh axis ``sph``
    and W over ``spw`` (4K-class inputs: a (2,4) mesh gives 8-way tiles with
    two-axis ppermute halo exchange). rgb_u8: [N,H,W,3] with H divisible by
    sph*ds and W by spw*ds. Returns uint8 symbols [N,h,w,3C] sharded on
    (h, w). ``valid_hw`` (multiples of ds) masks zero-padding beyond the
    logical image, exactly like :func:`tiled_encode`'s ``valid_w``."""
    ds = codec.downsample
    if halo is None:
        halo = ENCODE_HALO[codec.cfg.model.preset]
    halo = -(-halo // ds) * ds
    n_h, n_w = mesh.shape["sph"], mesh.shape["spw"]
    h, w = rgb_u8.shape[1:3]
    if valid_hw is None:
        valid_hw = (h, w)
    valid_h, valid_w = valid_hw
    if h % (n_h * ds) or w % (n_w * ds) or valid_h % ds or valid_w % ds:
        raise ValueError(
            f"H={h},W={w} not divisible by (sph*ds, spw*ds)=({n_h*ds},{n_w*ds})"
        )
    local_h, local_w = h // n_h, w // n_w

    def fn(p, tile_u8):
        x = tile_u8.astype(jnp.float32) / 255.0
        planes = cspace.rgb_to_planes(x, codec.colorspace)
        idx_h = jax.lax.axis_index("sph")
        idx_w = jax.lax.axis_index("spw")
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, local_h, 1, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, local_w, 1), 2)
        keep = (rows + idx_h * local_h < valid_h) & (
            cols + idx_w * local_w < valid_w
        )
        planes = jnp.where(keep, planes, 0.0)
        mask = _edge_mask_2d(halo, local_h, valid_h, halo, local_w, valid_w,
                             upsample=False)
        ext = _halo_exchange(planes, halo, "spw", n_w, axis=2)
        ext = _halo_exchange(ext, halo, "sph", n_h, axis=1)
        lat = codec.encode_planes(p, ext, column_mask=mask)
        crop = halo // ds
        lat = lat[:, crop : lat.shape[1] - crop, crop : lat.shape[2] - crop]
        return quantize(lat, codec.levels, codec.grid)

    return jax.shard_map(
        fn,
        mesh=mesh,
        check_vma=False,  # pallas_call inside shard_map needs vma checking off
        in_specs=(P(), P(None, "sph", "spw", None)),
        out_specs=P(None, "sph", "spw", None),
    )(params, rgb_u8)


def tiled_decode_2d(codec, params, sym_u8: jnp.ndarray, mesh: Mesh,
                    halo: int | None = None,
                    valid_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Inverse of :func:`tiled_encode_2d`: latent symbols sharded on (h, w)
    -> uint8 RGB sharded on (H, W). ``valid_hw`` is in latent units."""
    ds = codec.downsample
    if halo is None:
        halo = DECODE_HALO[codec.cfg.model.preset]
    n_h, n_w = mesh.shape["sph"], mesh.shape["spw"]
    lat_h, lat_w = sym_u8.shape[1:3]
    if valid_hw is None:
        valid_hw = (lat_h, lat_w)
    valid_h, valid_w = valid_hw
    if lat_h % n_h or lat_w % n_w:
        raise ValueError("latent dims not divisible by the spatial mesh")
    local_h, local_w = lat_h // n_h, lat_w // n_w

    def fn(p, tile_sym):
        lat = dequantize(tile_sym, codec.levels, codec.grid)
        idx_h = jax.lax.axis_index("sph")
        idx_w = jax.lax.axis_index("spw")
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, local_h, 1, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, local_w, 1), 2)
        keep = (rows + idx_h * local_h < valid_h) & (
            cols + idx_w * local_w < valid_w
        )
        lat = jnp.where(keep, lat, 0.0)
        ext = _halo_exchange(lat, halo, "spw", n_w, axis=2)
        ext = _halo_exchange(ext, halo, "sph", n_h, axis=1)
        mask = _edge_mask_2d(halo, local_h, valid_h, halo, local_w, valid_w,
                             upsample=True)
        planes = codec.decode_planes(p, ext, column_mask=mask)
        crop = halo * ds
        planes = planes[:, crop : planes.shape[1] - crop,
                        crop : planes.shape[2] - crop]
        rgb = jnp.clip(cspace.planes_to_rgb(planes, codec.colorspace), 0.0, 1.0)
        return jnp.round(rgb * 255.0).astype(jnp.uint8)

    return jax.shard_map(
        fn,
        mesh=mesh,
        check_vma=False,  # pallas_call inside shard_map needs vma checking off
        in_specs=(P(), P(None, "sph", "spw", None)),
        out_specs=P(None, "sph", "spw", None),
    )(params, sym_u8)


# --------------------------------------------------------------- bitstream


def _encode_tile_streams(codec, tile: np.ndarray, tables, adaptive: bool,
                         precision: int, engine: str) -> list[bytes]:
    """Per-tile independent streams (3 planes; x2 with embedded adaptive
    tables). Tile independence is the point — conditional models would
    couple tiles through their conditioning field, so tiles always use
    factorized (or per-tile adaptive) coding."""
    from neural_network_image_compression_tpu.coding.codec_stream import (
        encode_latent,
    )

    cch = codec.latent_channels
    if adaptive:
        from neural_network_image_compression_tpu.coding import rans
        from neural_network_image_compression_tpu.coding.adaptive import (
            plane_histogram_cdf,
            serialize_cdf,
        )

        streams = []
        for p in range(3):
            plane = np.ascontiguousarray(tile[..., p * cch : (p + 1) * cch])
            tab = plane_histogram_cdf(plane, codec.levels, precision)
            streams.append(serialize_cdf(tab, precision))
            streams.append(rans.stream_encode(plane, tab, precision, engine))
        return streams
    return encode_latent(tile, tables[0], tables[1], precision, engine=engine)


def _decode_tile_streams(codec, tile_streams: list[bytes],
                         tile_hw: tuple[int, int], tables, adaptive: bool,
                         precision: int, engine: str) -> np.ndarray:
    """Inverse of :func:`_encode_tile_streams` -> [th, tw, 3C] symbols."""
    from neural_network_image_compression_tpu.coding.codec_stream import (
        decode_latent,
    )

    th, tw = tile_hw
    if adaptive:
        from neural_network_image_compression_tpu.coding import rans
        from neural_network_image_compression_tpu.coding.adaptive import (
            deserialize_cdf,
        )

        cch = codec.latent_channels
        planes = []
        for p in range(3):
            tab = deserialize_cdf(
                tile_streams[2 * p], cch, codec.levels, precision
            )
            flat = rans.stream_decode(
                tile_streams[2 * p + 1], th * tw * cch, tab, precision, engine
            )
            planes.append(flat.reshape(th, tw, cch))
        return np.concatenate(planes, axis=-1)
    return decode_latent(tile_streams, (th, tw), tables[0], tables[1],
                         precision, engine=engine)


def _sym_checksum(sym: np.ndarray, engine: str) -> int:
    """Per-coder integrity checksum, matching codec_stream's convention:
    'lane' containers carry the order-independent on-chip checksum
    (coding/lane.checksum_u32), everything else zlib CRC-32 — so a 1-tile
    container is verifiable by either the tiled or the plain decoder."""
    import zlib

    if engine == "lane":
        from neural_network_image_compression_tpu.coding.lane import checksum_u32

        return int(checksum_u32(np.ascontiguousarray(sym)))
    return zlib.crc32(np.ascontiguousarray(sym).tobytes()) or 1


def compress_image_tiled(codec, params, rgb_u8: np.ndarray, mesh: Mesh,
                         tables=None) -> bytes:
    """Tile-parallel compress of one large image -> one container with
    ``n_tiles = spatial`` independent per-tile/per-plane rANS streams.

    The latent is produced on-mesh (halo exchange over ICI); the per-tile
    byte streams are assembled host-side (the coder is a host/C++ component)
    and gathered into the container — in a real multi-host run each host
    encodes its local tiles and the container segments are all-gathered.
    """
    from neural_network_image_compression_tpu.coding import build_tables
    from neural_network_image_compression_tpu.coding.codec_stream import encode_latent
    from neural_network_image_compression_tpu.coding.container import (
        ContainerHeader,
        pack_container,
    )

    if tables is None:
        tables = build_tables(codec, params)
    n_sp = mesh.shape["spatial"]
    ds = codec.downsample
    h, w = rgb_u8.shape[:2]
    # Reflect-pad to the ds multiple exactly like the whole-image path
    # (models/codec.py _pad), then ZERO-pad to the tile multiple; valid_w
    # masking keeps the result bit-identical to the whole-image encode.
    pad_h = (-h) % ds
    valid_w = w + ((-w) % ds)
    reflect = np.pad(
        rgb_u8, ((0, pad_h), (0, valid_w - w), (0, 0)), mode="reflect"
    )
    tile_pad = (-valid_w) % (n_sp * ds)
    padded = np.pad(reflect, ((0, 0), (0, tile_pad), (0, 0)))
    sym = np.asarray(
        tiled_encode(codec, params, jnp.asarray(padded[None]), mesh, valid_w=valid_w)
    )[0]
    lat_h = sym.shape[0]
    lat_w = valid_w // ds  # logical latent width (zeros beyond are dropped)
    tile_w = sym.shape[1] // n_sp
    precision = codec.cfg.entropy.cdf_precision
    engine = getattr(codec.cfg.codec, "coder", "rans64")
    # deterministic => always embed per-tile tables: the model tables are a
    # JAX float evaluation and differ across XLA backends (codec_stream.py
    # force_embed rationale); embedded numpy histogram tables make the tiled
    # container decodable on any platform.
    adaptive = getattr(codec.cfg.entropy, "adaptive_tables", False) or bool(
        getattr(codec.cfg.codec, "deterministic", False)
    )
    per = 2 if adaptive else 1
    cch = codec.latent_channels
    streams = []
    for t in range(n_sp):
        lo = t * tile_w
        hi = min((t + 1) * tile_w, lat_w)
        if hi <= lo:
            streams.extend([b""] * (3 * per))
            continue
        tile = np.ascontiguousarray(sym[:, lo:hi])
        # Per-tile streams use the plain factorized tables (tables[:2]) —
        # tile independence is the point; conditional models (checkerboard/
        # hyperprior) would couple tiles through their conditioning field.
        # With adaptive_tables, each tile embeds its own exact per-channel
        # histogram tables (coding/adaptive.py) — still fully independent,
        # and the only sane rate for hyperprior codecs whose static
        # factorized tables are untrained.
        if adaptive:
            from neural_network_image_compression_tpu.coding.adaptive import (
                plane_histogram_cdf,
                serialize_cdf,
            )

            from neural_network_image_compression_tpu.coding import rans

            for p in range(3):
                plane = np.ascontiguousarray(tile[..., p * cch : (p + 1) * cch])
                tab = plane_histogram_cdf(plane, codec.levels, precision)
                streams.append(serialize_cdf(tab, precision))
                streams.append(rans.stream_encode(plane, tab, precision, engine))
        else:
            streams.extend(
                encode_latent(tile, tables[0], tables[1], precision,
                              engine=engine)
            )
    import zlib

    header = ContainerHeader(
        model_id=codec.cfg.codec.model_id,
        colorspace=codec.colorspace.name,
        levels=codec.levels,
        latent_channels=codec.latent_channels,
        orig_h=h,
        orig_w=w,
        lat_h=lat_h,
        lat_w=lat_w,
        n_tiles=n_sp,
        passes=per,
        adaptive=adaptive,
        coder=engine,
        sym_crc=_sym_checksum(sym[:, :lat_w], engine),
    )
    return pack_container(header, streams)


def decompress_image_tiled(codec, params, data: bytes, mesh: Mesh,
                           tables=None) -> np.ndarray:
    """Tile-parallel inverse of :func:`compress_image_tiled`."""
    from neural_network_image_compression_tpu.coding import build_tables
    from neural_network_image_compression_tpu.coding.codec_stream import decode_latent
    from neural_network_image_compression_tpu.coding.container import unpack_container

    if tables is None:
        tables = build_tables(codec, params)
    header, streams = unpack_container(data)
    n_sp = header.n_tiles
    ds = codec.downsample
    lat_w = header.lat_w
    padded_lat_w = -(-lat_w // n_sp) * n_sp
    tile_w = padded_lat_w // n_sp
    per = header.passes
    precision = codec.cfg.entropy.cdf_precision
    tiles = []
    for t in range(n_sp):
        lo = t * tile_w
        hi = min((t + 1) * tile_w, lat_w)
        if hi <= lo:
            break
        tile_streams = streams[3 * per * t : 3 * per * (t + 1)]
        if header.adaptive:
            from neural_network_image_compression_tpu.coding import rans
            from neural_network_image_compression_tpu.coding.adaptive import (
                deserialize_cdf,
            )

            cch = header.latent_channels
            planes = []
            for p in range(3):
                tab = deserialize_cdf(
                    tile_streams[2 * p], cch, header.levels, precision
                )
                flat = rans.stream_decode(
                    tile_streams[2 * p + 1], header.lat_h * (hi - lo) * cch,
                    tab, precision, header.coder,
                )
                planes.append(flat.reshape(header.lat_h, hi - lo, cch))
            tiles.append(np.concatenate(planes, axis=-1))
        else:
            tiles.append(
                decode_latent(
                    tile_streams,
                    (header.lat_h, hi - lo),
                    tables[0],
                    tables[1],
                    precision,
                    engine=header.coder,
                )
            )
    sym = np.concatenate(tiles, axis=1)
    if header.sym_crc:
        got = _sym_checksum(sym, header.coder)
        if got != header.sym_crc:
            raise ValueError("latent symbol checksum mismatch in tiled decode")
    sym = np.pad(sym, ((0, 0), (0, padded_lat_w - lat_w), (0, 0)))
    rgb = np.asarray(
        tiled_decode(codec, params, jnp.asarray(sym[None]), mesh, valid_w=lat_w)
    )[0]
    return rgb[: header.orig_h, : header.orig_w]


# ------------------------------------------------------- 2-D tile bitstream
#
# Container convention: for a 2-D tile grid the u16 ``n_tiles`` header field
# packs the grid as (n_h << 8) | n_w (n_h, n_w in [1, 255]); 1-D containers
# keep writing the bare tile count (high byte 0 => n_h == 1). Streams are
# row-major over the grid, 3 (or 6 with embedded tables) per tile.


def compress_image_tiled_2d(codec, params, rgb_u8: np.ndarray, mesh: Mesh,
                            tables=None) -> bytes:
    """H x W tile-parallel compress of one large image -> one container with
    ``n_h * n_w`` independent per-tile/per-plane rANS streams (the latent is
    produced on-mesh with two-axis halo exchange; byte streams are host-side
    like every coder path)."""
    from neural_network_image_compression_tpu.coding import build_tables
    from neural_network_image_compression_tpu.coding.container import (
        ContainerHeader,
        pack_container,
    )

    n_h, n_w = mesh.shape["sph"], mesh.shape["spw"]
    if not (1 <= n_h <= 255 and 1 <= n_w <= 255):
        raise ValueError("2-D tile grid limited to 255 x 255")
    if tables is None:
        tables = build_tables(codec, params)
    ds = codec.downsample
    h, w = rgb_u8.shape[:2]
    pad_h = (-h) % ds
    pad_w = (-w) % ds
    valid_h, valid_w = h + pad_h, w + pad_w
    reflect = np.pad(rgb_u8, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    tile_pad_h = (-valid_h) % (n_h * ds)
    tile_pad_w = (-valid_w) % (n_w * ds)
    padded = np.pad(reflect, ((0, tile_pad_h), (0, tile_pad_w), (0, 0)))
    sym = np.asarray(
        tiled_encode_2d(
            codec, params, jnp.asarray(padded[None]), mesh,
            valid_hw=(valid_h, valid_w),
        )
    )[0]
    lat_h, lat_w = valid_h // ds, valid_w // ds
    tile_h = sym.shape[0] // n_h
    tile_w = sym.shape[1] // n_w
    precision = codec.cfg.entropy.cdf_precision
    engine = getattr(codec.cfg.codec, "coder", "rans64")
    adaptive = getattr(codec.cfg.entropy, "adaptive_tables", False) or bool(
        getattr(codec.cfg.codec, "deterministic", False)
    )
    per = 2 if adaptive else 1
    streams: list[bytes] = []
    for th in range(n_h):
        rlo, rhi = th * tile_h, min((th + 1) * tile_h, lat_h)
        for tw in range(n_w):
            clo, chi = tw * tile_w, min((tw + 1) * tile_w, lat_w)
            if rhi <= rlo or chi <= clo:
                streams.extend([b""] * (3 * per))
                continue
            tile = np.ascontiguousarray(sym[rlo:rhi, clo:chi])
            streams.extend(
                _encode_tile_streams(codec, tile, tables, adaptive,
                                     precision, engine)
            )
    import zlib

    header = ContainerHeader(
        model_id=codec.cfg.codec.model_id,
        colorspace=codec.colorspace.name,
        levels=codec.levels,
        latent_channels=codec.latent_channels,
        orig_h=h,
        orig_w=w,
        lat_h=lat_h,
        lat_w=lat_w,
        n_tiles=(n_h << 8) | n_w if n_h > 1 else n_w,
        passes=per,
        adaptive=adaptive,
        coder=engine,
        sym_crc=_sym_checksum(sym[:lat_h, :lat_w], engine),
    )
    return pack_container(header, streams)


def decompress_image_tiled_2d(codec, params, data: bytes, mesh: Mesh,
                              tables=None) -> np.ndarray:
    """Tile-parallel inverse of :func:`compress_image_tiled_2d`. The mesh
    may differ from the encoder's — the tile grid comes from the header and
    only the final synthesis pass runs on ``mesh``."""
    from neural_network_image_compression_tpu.coding import build_tables
    from neural_network_image_compression_tpu.coding.container import (
        unpack_container,
    )

    if tables is None:
        tables = build_tables(codec, params)
    header, streams = unpack_container(data)
    n_h = max(header.n_tiles >> 8, 1)
    n_w = header.n_tiles & 0xFF
    lat_h, lat_w = header.lat_h, header.lat_w
    tile_h = -(-lat_h // n_h)
    tile_w = -(-lat_w // n_w)
    per = header.passes
    precision = codec.cfg.entropy.cdf_precision
    rows = []
    for th in range(n_h):
        rlo, rhi = th * tile_h, min((th + 1) * tile_h, lat_h)
        row = []
        for tw in range(n_w):
            clo, chi = tw * tile_w, min((tw + 1) * tile_w, lat_w)
            t_idx = th * n_w + tw
            if rhi <= rlo or chi <= clo:
                continue
            tile_streams = streams[3 * per * t_idx : 3 * per * (t_idx + 1)]
            row.append(
                _decode_tile_streams(
                    codec, tile_streams, (rhi - rlo, chi - clo), tables,
                    header.adaptive, precision, header.coder,
                )
            )
        if row:
            rows.append(np.concatenate(row, axis=1))
    sym = np.concatenate(rows, axis=0)
    if header.sym_crc:
        got = _sym_checksum(sym, header.coder)
        if got != header.sym_crc:
            raise ValueError("latent symbol checksum mismatch in tiled decode")
    mesh_h, mesh_w = mesh.shape["sph"], mesh.shape["spw"]
    pad_h = (-lat_h) % mesh_h
    pad_w = (-lat_w) % mesh_w
    sym = np.pad(sym, ((0, pad_h), (0, pad_w), (0, 0)))
    rgb = np.asarray(
        tiled_decode_2d(
            codec, params, jnp.asarray(sym[None]), mesh,
            valid_hw=(lat_h, lat_w),
        )
    )[0]
    return rgb[: header.orig_h, : header.orig_w]

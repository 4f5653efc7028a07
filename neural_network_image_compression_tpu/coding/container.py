"""Bitstream container format.

The reference's "container" is a PNG file of the packed latent (reference
tf2_0/src/utils.py:42-43); shapes are implied by the PNG header and everything
else (model, colorspace, lambda) is implicit. Our container makes those
explicit (SURVEY.md section 7 capability 7): a small binary header plus one
independent rANS stream per colour plane per spatial tile — independence is
what lets a pod slice encode/decode tiles in parallel and gather segments
with a single collective.

Layout (little-endian):
    magic   4s   b"NIC1"
    version u8
    flags   u8       (bit0: bitstream kind, 0=rans 1=png-parity;
                      bit1: two-pass checkerboard-context streams;
                      bit2: hyperprior; bit3: per-image adaptive tables —
                      the first stream of each plane is an embedded CDF
                      table (coding/adaptive.py wire format) for the plane's
                      factorized-coded symbols: the anchor/latent stream, or
                      the hyper z stream when bit2 is also set;
                      bit4: rans64 coder — 64-bit-state 4-way-interleaved
                      streams, coding/rans.py encode64/decode64;
                      bit5: deterministic conditional — the context/hyper
                      mean/scale were computed with the fixed-point integer
                      inference (coding/detnet.py); writers always pair it
                      with bit3 so no stream depends on JAX-evaluated model
                      tables, making the container decode bit-exactly on ANY
                      platform; clear = float inference, decodable only on
                      the encoding platform;
                      bit6: joint context — per plane the streams are
                      [adaptive z table (bit3)] z-stream, anchor-stream
                      (hyper-Gaussian residuals), non-anchor-stream (joint
                      context residuals); bit2 is set alongside since a
                      hyper latent is transmitted)
    model_id        u8 length + utf-8 bytes
    colorspace      u8 length + utf-8 bytes
    levels  u16     quantizer levels
    latent_channels u16  (per plane)
    orig_h  u32, orig_w u32        original image size (crop target)
    lat_h   u32, lat_w  u32        full latent spatial size
    n_planes u8, n_tiles u16
    sym_crc u32     (v2+) CRC-32 of the latent symbol array bytes; 0 = none.
                    Decoders MUST verify when nonzero: the two-pass context
                    streams recompute float conv outputs at decode, so a
                    cross-platform numeric difference would otherwise corrupt
                    silently (every mod-levels symbol is decodable).
    per stream (n_planes * n_tiles * passes): u32 byte length
    stream bytes, concatenated in (tile-major, plane-minor, pass-minor)
    order; passes = 2 when flags bit1 is set (anchor stream then context
    stream per plane), else 1

Version history: v1 had no sym_crc and predates the two-pass stream-table
doubling; v2 adds sym_crc and readers reject any flag bits they do not
understand (a forward-compat reader must fail cleanly, not misparse); v3
adds an explicit u8 coder id immediately after the flags byte (the flag
space ran out at two coders) — written only for coders v2 cannot express
(the on-chip 'lane' engine), so every rans32/rans64 container stays
byte-identical to v2.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

MAGIC = b"NIC1"
VERSION = 2
VERSION_CODER = 3          # emitted when the coder needs the v3 coder byte
_CODER_IDS = {"rans32": 0, "rans64": 1, "lane": 2}
_CODER_NAMES = {v: k for k, v in _CODER_IDS.items()}
# bit0 png, bit1 two-pass context, bit2 hyperprior,
# bit3 per-image adaptive tables (first stream of each plane is a table),
# bit4 rans64 coder (64-bit-state 4-way-interleaved streams; clear = the
#      legacy 32-bit single-state byte format),
# bit5 deterministic fixed-point conditional inference (coding/detnet.py)
# bit6 joint context (hyperprior + checkerboard): per plane the streams are
#      [adaptive z table (bit3)] z-stream, anchor-stream (hyper Gaussian),
#      non-anchor-stream (joint Gaussian) — passes = 3 (+1 with bit3)
# bit7 channel context (CHARM-style channel-wise autoregression): per plane
#      the streams are [adaptive table (bit3)] slice-0 stream (factorized)
#      then one conditional stream per later channel slice — passes =
#      channel_slices (+1 with bit3). A u8 slice-count field follows sym_crc
#      when this bit is set.
_KNOWN_FLAGS = 0b11111111


@dataclass
class ContainerHeader:
    model_id: str
    colorspace: str
    levels: int
    latent_channels: int
    orig_h: int
    orig_w: int
    lat_h: int
    lat_w: int
    n_planes: int = 3
    n_tiles: int = 1
    kind: str = "rans"  # 'rans' | 'png'
    passes: int = 1     # streams per plane per tile: 1 + context pass
                        # (checkerboard or hyper z) + adaptive-table pass
    hyper: bool = False # second stream per plane is a hyper z stream
    adaptive: bool = False  # first stream per plane is an embedded per-image
                            # CDF table (coding/adaptive.py wire format)
    sym_crc: int = 0    # CRC-32 of the symbol array bytes (0 = unchecked)
    coder: str = "rans32"  # 'rans32' (legacy byte format) | 'rans64'
                           # (interleaved; flag bit4). Compress paths set this
                           # from CodecConfig.coder; default keeps bytes of
                           # hand-built legacy containers unchanged.
    det: bool = False   # conditional params came from the deterministic
                        # fixed-point inference (flag bit5): the decoder must
                        # use it too, and may run on any platform
    joint: bool = False # joint context (flag bit6): z + anchor + non-anchor
                        # streams per plane (see module docstring)
    channel_slices: int = 0  # >0 = channel context (flag bit7): slice-0
                             # factorized stream + per-slice conditional
                             # streams; value is the slice count S
                             # (passes = S + adaptive)


def tile_grid(n_tiles: int) -> tuple[int, int]:
    """Decode the u16 ``n_tiles`` field into a (n_h, n_w) tile grid.

    1-D containers store the bare tile count (high byte 0 -> one row);
    2-D containers (parallel/spatial.py compress_image_tiled_2d) pack
    ``(n_h << 8) | n_w``. Total stream count scales with n_h * n_w."""
    n_h = n_tiles >> 8
    if n_h == 0:
        return 1, max(n_tiles, 1)
    return n_h, n_tiles & 0xFF


def tile_count(n_tiles: int) -> int:
    n_h, n_w = tile_grid(n_tiles)
    return n_h * n_w


def pack_container(header: ContainerHeader, streams: list[bytes]) -> bytes:
    expected = header.n_planes * tile_count(header.n_tiles) * header.passes
    if len(streams) != expected:
        raise ValueError(f"expected {expected} streams, got {len(streams)}")
    mid = header.model_id.encode()
    cs = header.colorspace.encode()
    if header.kind == "png":
        flags = 1
        if header.passes != 1 or header.hyper or header.adaptive:
            raise ValueError("png containers carry one opaque stream")
    else:
        flags = 0
        conditional = header.passes - 1 - (1 if header.adaptive else 0)
        if header.channel_slices:
            if header.channel_slices < 2 or header.channel_slices > 255:
                raise ValueError("channel_slices must be in [2, 255]")
            if conditional != header.channel_slices - 1:
                raise ValueError(
                    "channel containers carry a slice-0 pass plus one "
                    "conditional pass per later slice"
                )
            if header.hyper or header.joint:
                raise ValueError(
                    "channel context excludes hyper/joint stream layouts"
                )
            flags |= 128
        elif header.joint:
            if conditional != 2:
                raise ValueError(
                    "joint containers carry z + anchor + non-anchor passes"
                )
            if not header.hyper:
                raise ValueError("joint containers transmit a hyper latent")
            flags |= 64 | 4
        else:
            if conditional not in (0, 1):
                raise ValueError(
                    f"passes {header.passes} inconsistent with "
                    f"adaptive={header.adaptive}"
                )
            if header.hyper and conditional != 1:
                raise ValueError("hyper containers need a conditional pass")
            if conditional == 1:
                flags |= 4 if header.hyper else 2
        if header.adaptive:
            flags |= 8
        if header.coder == "rans64":
            flags |= 16
        elif header.coder not in _CODER_IDS:
            raise ValueError(f"unknown coder {header.coder!r}")
        if header.det:
            if conditional < 1:
                raise ValueError("det applies only to conditional containers")
            flags |= 32
    # v3 only when the coder cannot be expressed by flag bit4 — keeps every
    # rans32/rans64 container byte-identical to v2.
    version = VERSION
    coder_byte = b""
    if header.kind != "png" and header.coder not in ("rans32", "rans64"):
        version = VERSION_CODER
        flags &= ~16
        coder_byte = struct.pack("<B", _CODER_IDS[header.coder])
    parts = [
        MAGIC,
        struct.pack("<BB", version, flags),
        coder_byte,
        struct.pack("<B", len(mid)), mid,
        struct.pack("<B", len(cs)), cs,
        struct.pack(
            "<HHIIIIBHI",
            header.levels,
            header.latent_channels,
            header.orig_h,
            header.orig_w,
            header.lat_h,
            header.lat_w,
            header.n_planes,
            header.n_tiles,
            header.sym_crc & 0xFFFFFFFF,
        ),
    ]
    if header.kind != "png" and header.channel_slices:
        parts.append(struct.pack("<B", header.channel_slices))
    parts.extend(struct.pack("<I", len(s)) for s in streams)
    parts.extend(streams)
    return b"".join(parts)


def unpack_container(data: bytes) -> tuple[ContainerHeader, list[bytes]]:
    if data[:4] != MAGIC:
        raise ValueError("not a NIC1 container")
    pos = 4
    version, flags = struct.unpack_from("<BB", data, pos)
    pos += 2
    if version not in (1, VERSION, VERSION_CODER):
        raise ValueError(f"unsupported container version {version}")
    if flags & ~_KNOWN_FLAGS:
        raise ValueError(
            f"container uses unknown flag bits 0x{flags & ~_KNOWN_FLAGS:02x}; "
            "refusing to parse (stream layout may differ)"
        )
    coder_id = None
    if version >= VERSION_CODER:
        (coder_id,) = struct.unpack_from("<B", data, pos)
        pos += 1
        if coder_id not in _CODER_NAMES:
            raise ValueError(f"unknown coder id {coder_id}")
    (mlen,) = struct.unpack_from("<B", data, pos)
    pos += 1
    model_id = data[pos : pos + mlen].decode()
    pos += mlen
    (clen,) = struct.unpack_from("<B", data, pos)
    pos += 1
    colorspace = data[pos : pos + clen].decode()
    pos += clen
    levels, cch, oh, ow, lh, lw, n_planes, n_tiles = struct.unpack_from(
        "<HHIIIIBH", data, pos
    )
    pos += struct.calcsize("<HHIIIIBH")
    sym_crc = 0
    if version >= 2:
        (sym_crc,) = struct.unpack_from("<I", data, pos)
        pos += 4
    channel_slices = 0
    if flags & 1:
        passes = 1
    elif flags & 128:
        (channel_slices,) = struct.unpack_from("<B", data, pos)
        pos += 1
        if channel_slices < 2:
            # Mirror pack_container's [2, 255] check: a corrupt byte here
            # would otherwise yield passes=0/1 and confusing downstream
            # failures instead of a clean header error.
            raise ValueError(
                f"corrupt container: channel_slices={channel_slices}, "
                "must be in [2, 255]"
            )
        passes = channel_slices + (1 if flags & 8 else 0)
    elif flags & 64:
        passes = 3 + (1 if flags & 8 else 0)
    else:
        passes = 1 + (1 if flags & (2 | 4) else 0) + (1 if flags & 8 else 0)
    n_streams = n_planes * tile_count(n_tiles) * passes
    lengths = struct.unpack_from(f"<{n_streams}I", data, pos)
    pos += 4 * n_streams
    streams = []
    for ln in lengths:
        streams.append(data[pos : pos + ln])
        pos += ln
    if pos != len(data):
        raise ValueError("trailing bytes in container")
    header = ContainerHeader(
        model_id=model_id,
        colorspace=colorspace,
        levels=levels,
        latent_channels=cch,
        orig_h=oh,
        orig_w=ow,
        lat_h=lh,
        lat_w=lw,
        n_planes=n_planes,
        n_tiles=n_tiles,
        kind="png" if flags & 1 else "rans",
        passes=passes,
        hyper=bool(flags & 4),
        adaptive=bool(flags & 8),
        sym_crc=sym_crc,
        coder=(
            _CODER_NAMES[coder_id]
            if coder_id is not None
            else ("rans64" if flags & 16 else "rans32")
        ),
        det=bool(flags & 32),
        joint=bool(flags & 64),
        channel_slices=channel_slices,
    )
    return header, streams

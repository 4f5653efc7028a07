"""Fused batched serving path: container-in -> pixels-out at batch scale.

Single-image serving (codec_stream.compress_image) pays one device dispatch
per model pass per image plus the host coder chain — through a remote-tunnel
TPU that latency floor dominated round 4's numbers (1-2 img/s vs 793 img/s
for the batched forward). This module is the production path the VERDICT
asked for: ONE jitted program per batch runs analysis, quantization, the
wsym/row computation AND the lane-parallel rANS scans (coding/lane.py) for
every stream of every image; the host only compacts emitted words into
container bytes. Decode threads the host entropy decode per image and runs
ONE jitted synthesis over the whole batch.

Bit-compatibility contract: containers written here are ordinary 'lane'
containers — decodable one at a time by codec_stream.decompress_image. The
checkerboard conditionals are computed by the SAME cached jitted `_ctx_fn`
executable the single-image decoder uses (per image, [1,h,w,3C] shape), so
encoder/decoder float outputs are bit-identical on the encoding platform;
the mu/idx derivation (round, mod, searchsorted) is exact arithmetic on
those floats on either side. Supported contexts: 'none' and 'checkerboard'
(the flagship high-rate mode); other contexts and det/adaptive containers
take the general per-image path.
"""
from __future__ import annotations

import functools
import zlib
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from neural_network_image_compression_tpu.coding import lane, rans
from neural_network_image_compression_tpu.coding import codec_stream as cs
from neural_network_image_compression_tpu.coding.container import (
    ContainerHeader,
    pack_container,
)


def _supported(codec) -> bool:
    e = codec.cfg.entropy
    return (
        e.context in ("none", "checkerboard")
        and getattr(codec, "hyper_enc_y", None) is None
        and not getattr(codec.cfg.codec, "deterministic", False)
    )


def _plane_rows(cch: int, count: int, offset: int) -> np.ndarray:
    return (np.arange(count, dtype=np.int64) % cch + offset).astype(np.int32)


@functools.lru_cache(maxsize=16)
def _anchor_indices(h: int, w: int):
    amask = cs._anchor_mask(h, w)
    ai, aj = np.nonzero(amask)
    ni, nj = np.nonzero(~amask)
    return (ai, aj), (ni, nj)


def _fused_lane_fn(codec, n: int, lat_hw: tuple[int, int]):
    """Cached jitted lane-scan program for a fixed (batch, latent grid):
    runs every stream's rANS scan on-chip. Inputs are the quantized symbol
    batch (and, with the checkerboard context, the on-device mu/idx grids);
    model passes happen in the shared jitted encode / _ctx_fn programs so
    the bytes stay bit-compatible with single-image decode."""
    cache = getattr(codec, "_onchip_lane_fns", None)
    if cache is None:
        cache = codec._onchip_lane_fns = {}
    key = (n, lat_hw)
    fn = cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    cch = codec.latent_channels
    levels = codec.levels
    precision = codec.cfg.entropy.cdf_precision
    lp1 = levels + 1
    ctx = codec.context_y is not None
    h_lat, w_lat = lat_hw

    if ctx:
        (ai, aj), (ni, nj) = _anchor_indices(h_lat, w_lat)
        n_anchor, n_non = ai.size, ni.size
        k_a = lane.pick_lanes(n_anchor * cch)
        k_c = lane.pick_lanes(n_non * cch)
        m_a = -(-n_anchor * cch // k_a)
        m_c = -(-n_non * cch // k_c)
        act_a = (np.arange(m_a * k_a) < n_anchor * cch).reshape(m_a, k_a)
        act_c = (np.arange(m_c * k_c) < n_non * cch).reshape(m_c, k_c)
        # anchor rows: per plane p, channel pattern offset into [cdf_y;cdf_c]
        rows_a = np.stack(
            [
                _pad_grid(_plane_rows(cch, n_anchor * cch, 0), m_a, k_a),
                _pad_grid(_plane_rows(cch, n_anchor * cch, cch), m_a, k_a),
                _pad_grid(_plane_rows(cch, n_anchor * cch, cch), m_a, k_a),
            ]
        )  # [3, m_a, k_a]

        def fused(sym, cdf_yc_flat, scale_cdf_flat, mu, idx):
            s32 = sym.astype(jnp.int32)
            outs_a, outs_c = [], []
            for p in range(3):
                plane = s32[..., p * cch : (p + 1) * cch]
                a_flat = plane[:, ai, aj, :].reshape(n, n_anchor * cch)
                a2 = _grid_j(a_flat, m_a, k_a)
                st, pk, ct = jax.vmap(
                    lambda s: _scan_pack(
                        s, jnp.asarray(rows_a[p]), jnp.asarray(act_a),
                        cdf_yc_flat, lp1, precision,
                    )
                )(a2)
                outs_a.append((st, pk, ct))
                mu_p = mu[..., p * cch : (p + 1) * cch]
                idx_p = idx[..., p * cch : (p + 1) * cch]
                nn = plane[:, ni, nj, :].reshape(n, n_non * cch)
                mu_f = mu_p[:, ni, nj, :].reshape(n, n_non * cch)
                wsym = jnp.mod(nn - mu_f + levels // 2, levels)
                idx_f = idx_p[:, ni, nj, :].reshape(n, n_non * cch)
                w2 = _grid_j(wsym, m_c, k_c)
                r2 = _grid_j(idx_f, m_c, k_c)
                st, pk, ct = jax.vmap(
                    lambda s, r: _scan_pack(
                        s, r, jnp.asarray(act_c), scale_cdf_flat, lp1,
                        precision,
                    )
                )(w2, r2)
                outs_c.append((st, pk, ct))
            return outs_a, outs_c

        fn = jax.jit(fused)
    else:
        n_sym = h_lat * w_lat * cch
        k_p = lane.pick_lanes(n_sym)
        m_p = -(-n_sym // k_p)
        act_p = (np.arange(m_p * k_p) < n_sym).reshape(m_p, k_p)
        rows_p = np.stack(
            [
                _pad_grid(_plane_rows(cch, n_sym, 0), m_p, k_p),
                _pad_grid(_plane_rows(cch, n_sym, cch), m_p, k_p),
                _pad_grid(_plane_rows(cch, n_sym, cch), m_p, k_p),
            ]
        )

        def fused(sym, cdf_yc_flat):
            s32 = sym.astype(jnp.int32)
            outs = []
            for p in range(3):
                plane = s32[..., p * cch : (p + 1) * cch].reshape(n, n_sym)
                p2 = _grid_j(plane, m_p, k_p)
                st, pk, ct = jax.vmap(
                    lambda s: _scan_pack(
                        s, jnp.asarray(rows_p[p]), jnp.asarray(act_p),
                        cdf_yc_flat, lp1, precision,
                    )
                )(p2)
                outs.append((st, pk, ct))
            return outs

        fn = jax.jit(fused)
    cache[key] = fn
    return fn


def _scan_pack(sym2, rows2, active, cdf_flat, lp1, precision):
    """lane_scan + on-chip word compaction: returns (states [K] u32,
    packed [m*K] u16, count i32) — only the [:count] prefix (plus states)
    ever crosses to the host."""
    st, wd, em = lane.lane_scan(sym2, rows2, active, cdf_flat, lp1, precision)
    pk, ct = lane.pack_words(wd, em)
    return st, pk, ct


def _fetch_packed(out) -> tuple:
    """(states, packed, counts) device triple -> host, fetching only the
    used word-prefix: counts first (tiny), then packed[:, :max(counts)] as
    one device-side slice + transfer."""
    st_d, pk_d, ct_d = out
    counts = np.asarray(ct_d)
    maxc = int(counts.max()) if counts.size else 0
    packed = np.asarray(pk_d[:, :maxc]) if maxc else np.zeros(
        (counts.shape[0], 0), np.uint16
    )
    return np.asarray(st_d), packed, counts


def _stream_bytes(fetched: tuple, i: int) -> bytes:
    """Assemble one image's lane stream from the fetched packed triple."""
    states, packed, counts = fetched
    k = states.shape[1]
    return (
        int(k).to_bytes(2, "little")
        + states[i].astype("<u4").tobytes()
        + packed[i, : counts[i]].astype("<u2").tobytes()
    )


def _pad_grid(flat: np.ndarray, m: int, k: int) -> np.ndarray:
    out = np.zeros(m * k, flat.dtype)
    out[: flat.size] = flat
    return out.reshape(m, k)


def _grid_j(flat, m: int, k: int):
    import jax.numpy as jnp

    pad = m * k - flat.shape[-1]
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return flat.reshape(flat.shape[0], m, k)


def compress_batch(codec, params, imgs: np.ndarray, tables=None,
                   workers: int = 8) -> list[bytes]:
    """uint8 [N,H,W,3] (one shape) -> N container blobs.

    coder='lane' + a supported context: the fully fused on-chip path (one
    lane-scan program per batch). Any other coder/context: ONE batched
    jitted analysis pass, then the host entropy coder fans out over threads
    (the C++ rANS coder releases the GIL) — the rd_point_batched structure,
    now available as a serving API."""
    if imgs.ndim != 4:
        raise ValueError("compress_batch wants [N,H,W,3]")
    n, h, w = imgs.shape[:3]
    engine = getattr(codec.cfg.codec, "coder", rans.DEFAULT_ENGINE)
    if not _supported(codec) or engine != "lane":
        if tables is None and not getattr(
            codec.cfg.codec, "deterministic", False
        ):
            tables = cs.build_tables(codec, params)
        import jax.numpy as jnp

        enc_jit, _ = cs.jitted_codec_fns(codec)
        sym = np.asarray(enc_jit(params, jnp.asarray(imgs)))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(
                pool.map(
                    lambda i: cs.compress_symbols(
                        codec, params, sym[i], (h, w), tables
                    ),
                    range(n),
                )
            )
    import jax.numpy as jnp

    if tables is None:
        tables = cs.build_tables(codec, params)
    cdf_y, cdf_c = tables[0], tables[1]
    cdf_yc = np.concatenate([cdf_y, cdf_c], axis=0)
    cch = codec.latent_channels
    levels = codec.levels
    ctx = codec.context_y is not None

    # All device passes chain asynchronously: batched encode -> per-image
    # conditionals -> the fused lane program; the host syncs once, on the
    # lane outputs (and the symbol batch for CRCs).
    enc_jit, _ = cs.jitted_codec_fns(codec)
    imgs_d = jnp.asarray(imgs)
    sym_d = enc_jit(params, imgs_d)
    cdf_dev = jnp.asarray(cdf_yc.reshape(-1))
    fn = _fused_lane_fn(codec, n, tuple(sym_d.shape[1:3]))

    if ctx:
        _, scale_cdfs = cs._codec_scale_tables(codec)
        # Conditionals via the SAME per-image executable the decoder uses —
        # bit-identical mu/idx on both sides (see module docstring); the
        # executable already derives the coding integers on device
        # (codec_stream._device_mu_idx).
        ctx_fn = cs._ctx_fn(codec)
        mu_list, idx_list = [], []
        for i in range(n):
            mu_i, idx_i = ctx_fn(params, sym_d[i : i + 1])
            mu_list.append(mu_i)
            idx_list.append(idx_i)
        mu = jnp.stack(mu_list)
        idx = jnp.stack(idx_list)
        outs_a, outs_c = fn(
            sym_d, cdf_dev,
            jnp.asarray(np.ascontiguousarray(scale_cdfs, np.uint32).reshape(-1)),
            mu, idx,
        )
        sym = np.asarray(sym_d)
        outs_a = [_fetch_packed(o) for o in outs_a]
        outs_c = [_fetch_packed(o) for o in outs_c]
    else:
        outs = fn(sym_d, cdf_dev)
        sym = np.asarray(sym_d)
        outs = [_fetch_packed(o) for o in outs]

    blobs = []
    eng = "lane"
    for i in range(n):
        streams = []
        for p in range(3):
            if ctx:
                streams.append(_stream_bytes(outs_a[p], i))
                streams.append(_stream_bytes(outs_c[p], i))
            else:
                streams.append(_stream_bytes(outs[p], i))
        header = ContainerHeader(
            model_id=codec.cfg.codec.model_id,
            colorspace=codec.colorspace.name,
            levels=levels,
            latent_channels=cch,
            orig_h=h,
            orig_w=w,
            lat_h=sym.shape[1],
            lat_w=sym.shape[2],
            n_planes=3,
            passes=2 if ctx else 1,
            kind="rans",
            coder=eng,
            sym_crc=zlib.crc32(np.ascontiguousarray(sym[i]).tobytes()) or 1,
        )
        blobs.append(pack_container(header, streams))
    return blobs


def decompress_batch(codec, params, blobs: list[bytes], tables=None,
                     workers: int = 8) -> list[np.ndarray]:
    """N container blobs -> N uint8 [H,W,3] images. Host entropy decode
    fans out over threads (the C++ coder releases the GIL); synthesis runs
    as ONE jitted call per shape group."""
    if tables is None and not all(
        cs.unpack_container(b)[0].adaptive for b in blobs
    ):
        tables = cs.build_tables(codec, params)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pairs = list(
            pool.map(
                lambda b: cs.decompress_symbols(codec, params, b, tables),
                blobs,
            )
        )
    import jax.numpy as jnp

    _, dec_jit = cs.jitted_codec_fns(codec)
    out: list[np.ndarray | None] = [None] * len(pairs)
    groups: dict[tuple, list[int]] = {}
    for i, (hdr, _) in enumerate(pairs):
        groups.setdefault((hdr.orig_h, hdr.orig_w, hdr.lat_h, hdr.lat_w), []).append(i)
    for (oh, ow, _, _), idxs in groups.items():
        syms = jnp.asarray(np.stack([pairs[i][1] for i in idxs]))
        rgb = np.asarray(dec_jit(params, syms, out_hw=(oh, ow)))
        for k, i in enumerate(idxs):
            out[i] = rgb[k]
    return out

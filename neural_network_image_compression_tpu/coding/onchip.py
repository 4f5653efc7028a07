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


def _start_freq(sym, rows, table, chunk: int = 8):
    """Pre-gather the per-symbol coding params (start, freq) as one-hot
    contractions: sym/rows [G, n] i32, table [R, L+1] u32 -> u32 [G, n].

    XLA:TPU's native gather from a multi-row CDF table is pathologically
    slow (measured 1.06 s vs 55 ms for the same 18.8M lookups done this
    way); the one-hot products are exact — every term is 0 or an integer
    <= 2^16, and exactly one term per output is nonzero, so the f32
    accumulation cannot round."""
    import jax.numpy as jnp
    from jax.lax import Precision

    levels = table.shape[1] - 1
    n_rows = table.shape[0]
    t_a = table[:, :levels].astype(jnp.float32)
    t_b = table[:, 1:].astype(jnp.float32)
    outs_s, outs_f = [], []
    for lo in range(0, sym.shape[0], chunk):
        s = sym[lo : lo + chunk]
        r = rows[lo : lo + chunk]
        o_s = (s[..., None] == jnp.arange(levels)).astype(jnp.float32)
        o_r = (r[..., None] == jnp.arange(n_rows)).astype(jnp.float32)
        a = jnp.einsum("gns,rs->gnr", o_s, t_a, precision=Precision.HIGHEST)
        b = jnp.einsum("gns,rs->gnr", o_s, t_b, precision=Precision.HIGHEST)
        st = (a * o_r).sum(-1)
        nx = (b * o_r).sum(-1)
        outs_s.append(st.astype(jnp.uint32))
        outs_f.append((nx - st).astype(jnp.uint32))
    return jnp.concatenate(outs_s), jnp.concatenate(outs_f)


def _fused_lane_fn(codec, n: int, lat_hw: tuple[int, int]):
    """Cached jitted lane-scan program for a fixed (batch, latent grid):
    runs EVERY stream of every image in ONE vmapped scan over pre-gathered
    (start, freq) grids. Model passes happen in the shared jitted encode /
    _ctx_fn programs so the bytes stay bit-compatible with single-image
    decode; streams whose native lane count k_s is below the merged K run
    in the first k_s lanes with the rest masked (lanes are independent, so
    bytes equal a solo encode at k_s — gated by test_onchip)."""
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
    ctx = codec.context_y is not None
    h_lat, w_lat = lat_hw

    if ctx:
        (ai, aj), (ni, nj) = _anchor_indices(h_lat, w_lat)
        n_a, n_c = ai.size * cch, ni.size * cch
        k_a = lane.pick_lanes(n_a)
        k_c = lane.pick_lanes(n_c)
        kk = max(k_a, k_c)
        m_a = -(-n_a // k_a)
        m_c = -(-n_c // k_c)
        mm = max(m_a, m_c)
        act_a = _pad_envelope(
            (np.arange(m_a * k_a) < n_a).reshape(m_a, k_a), mm, kk
        )
        act_c = _pad_envelope(
            (np.arange(m_c * k_c) < n_c).reshape(m_c, k_c), mm, kk
        )
        # anchor CDF rows: the channel pattern, offset into [cdf_y; cdf_c]
        rows_anchor = np.stack([
            _plane_rows(cch, n_a, 0),
            _plane_rows(cch, n_a, cch),
            _plane_rows(cch, n_a, cch),
        ])  # [3, n_a]
        act_stack = np.stack([act_a, act_c] * 3)  # a0,c0,a1,c1,a2,c2

        def fused(sym, cdf_yc_flat2d, scale_cdf2d, mu, idx):
            s32 = sym.astype(jnp.int32)
            a_syms, w_syms, i_rows = [], [], []
            for p in range(3):
                plane = s32[..., p * cch : (p + 1) * cch]
                a_syms.append(plane[:, ai, aj, :].reshape(n, n_a))
                mu_f = mu[..., p * cch : (p + 1) * cch][:, ni, nj, :].reshape(n, n_c)
                nn = plane[:, ni, nj, :].reshape(n, n_c)
                w_syms.append(jnp.mod(nn - mu_f + levels // 2, levels))
                i_rows.append(
                    idx[..., p * cch : (p + 1) * cch][:, ni, nj, :].reshape(n, n_c)
                )
            a_sym = jnp.concatenate(a_syms)          # [3N, n_a] plane-major
            a_row = jnp.concatenate([
                jnp.broadcast_to(jnp.asarray(rows_anchor[p]), (n, n_a))
                for p in range(3)
            ])
            c_sym = jnp.concatenate(w_syms)          # [3N, n_c]
            c_row = jnp.concatenate(i_rows)
            sa, fa = _start_freq(a_sym, a_row, cdf_yc_flat2d)
            sc, fc = _start_freq(c_sym, c_row, scale_cdf2d)

            def env(v, m_s, k_s):
                g = _grid_j(v, m_s, k_s)
                return jnp.pad(g, ((0, 0), (0, mm - m_s), (0, kk - k_s)))

            # [3N, mm, kk] each -> interleave to image-major [N,3,2,...]
            def interleave(av, cv):
                a3 = av.reshape(3, n, mm, kk).transpose(1, 0, 2, 3)
                c3 = cv.reshape(3, n, mm, kk).transpose(1, 0, 2, 3)
                return jnp.stack([a3, c3], axis=2).reshape(6 * n, mm, kk)

            start_items = interleave(env(sa, m_a, k_a), env(sc, m_c, k_c))
            freq_items = interleave(env(fa, m_a, k_a), env(fc, m_c, k_c))
            act_items = jnp.broadcast_to(
                jnp.asarray(act_stack)[None], (n, 6, mm, kk)
            ).reshape(6 * n, mm, kk)
            st, pk, ct = jax.vmap(
                lambda s, f, a: _scan_pack_sf(s, f, a, precision)
            )(start_items, freq_items, act_items)
            chks = jax.vmap(lane.checksum_u32)(sym)
            return (st, pk, ct), chks

        fn = jax.jit(fused), (k_a, k_c), 6
    else:
        n_sym = h_lat * w_lat * cch
        k_p = lane.pick_lanes(n_sym)
        m_p = -(-n_sym // k_p)
        act_p = (np.arange(m_p * k_p) < n_sym).reshape(m_p, k_p)
        rows_plane = np.stack([
            _plane_rows(cch, n_sym, 0),
            _plane_rows(cch, n_sym, cch),
            _plane_rows(cch, n_sym, cch),
        ])

        def fused(sym, cdf_yc2d):
            s32 = sym.astype(jnp.int32)
            p_sym = jnp.concatenate([
                s32[..., p * cch : (p + 1) * cch].reshape(n, n_sym)
                for p in range(3)
            ])  # [3N, n_sym] plane-major
            p_row = jnp.concatenate([
                jnp.broadcast_to(jnp.asarray(rows_plane[p]), (n, n_sym))
                for p in range(3)
            ])
            sp, fp = _start_freq(p_sym, p_row, cdf_yc2d)
            # plane-major [3N] -> image-major [N, 3]
            sp = _grid_j(sp, m_p, k_p).reshape(3, n, m_p, k_p).transpose(1, 0, 2, 3).reshape(3 * n, m_p, k_p)
            fp = _grid_j(fp, m_p, k_p).reshape(3, n, m_p, k_p).transpose(1, 0, 2, 3).reshape(3 * n, m_p, k_p)
            act_items = jnp.broadcast_to(
                jnp.asarray(act_p)[None, None], (n, 3, m_p, k_p)
            ).reshape(3 * n, m_p, k_p)
            st, pk, ct = jax.vmap(
                lambda s, f, a: _scan_pack_sf(s, f, a, precision)
            )(sp, fp, act_items)
            chks = jax.vmap(lane.checksum_u32)(sym)
            return (st, pk, ct), chks

        fn = jax.jit(fused), (k_p,), 3
    cache[key] = fn
    return fn


def _pad_envelope(grid: np.ndarray, mm: int, kk: int) -> np.ndarray:
    out = np.zeros((mm, kk), grid.dtype)
    out[: grid.shape[0], : grid.shape[1]] = grid
    return out


def _scan_pack_sf(start2, freq2, active, precision):
    """lane_scan_sf + on-chip word compaction."""
    st, wd, em = lane.lane_scan_sf(start2, freq2, active, precision)
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


def _stream_bytes(fetched: tuple, item: int, k_s: int | None = None) -> bytes:
    """Assemble one stream's bytes from the fetched packed triple.
    ``k_s``: the stream's NATIVE lane count when it ran lane-padded inside
    a merged envelope — only the first k_s states are real (padded lanes
    never advance and never emit, so the packed words need no slicing)."""
    states, packed, counts = fetched
    k = k_s if k_s is not None else states.shape[1]
    return (
        int(k).to_bytes(2, "little")
        + states[item, :k].astype("<u4").tobytes()
        + packed[item, : counts[item]].astype("<u2").tobytes()
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
    fn, stream_ks, n_streams = _fused_lane_fn(codec, n, tuple(sym_d.shape[1:3]))

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
        outs, chks_d = fn(
            sym_d, jnp.asarray(cdf_yc),
            jnp.asarray(np.ascontiguousarray(scale_cdfs, np.uint32)),
            mu, idx,
        )
    else:
        outs, chks_d = fn(sym_d, jnp.asarray(cdf_yc))
    fetched = _fetch_packed(outs)  # one fetch for ALL streams of the batch
    # integrity checksums computed ON device (lane.checksum_u32) — the
    # symbol batch itself never crosses to the host (it was ~30% of
    # compress wall through the tunnel, runs_r5/serving_breakdown).
    chks = np.asarray(chks_d)
    lat_h, lat_w = int(sym_d.shape[1]), int(sym_d.shape[2])

    blobs = []
    eng = "lane"
    for i in range(n):
        streams = []
        for j in range(n_streams):
            # item order is image-major: stream j of image i
            k_s = stream_ks[j % len(stream_ks)]
            streams.append(_stream_bytes(fetched, i * n_streams + j, k_s))
        header = ContainerHeader(
            model_id=codec.cfg.codec.model_id,
            colorspace=codec.colorspace.name,
            levels=levels,
            latent_channels=cch,
            orig_h=h,
            orig_w=w,
            lat_h=lat_h,
            lat_w=lat_w,
            n_planes=3,
            passes=2 if ctx else 1,
            kind="rans",
            coder=eng,
            sym_crc=int(chks[i]),
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

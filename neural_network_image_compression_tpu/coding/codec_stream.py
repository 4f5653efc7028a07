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


def _lane_checksum(sym) -> int:
    from neural_network_image_compression_tpu.coding.lane import checksum_u32

    return int(checksum_u32(np.ascontiguousarray(sym)))


def jitted_codec_fns(codec):
    """Per-codec cached jitted (encode, decode) callables.

    Every model evaluation on the coding path MUST go through these: eager
    per-primitive dispatch is not only slow, it compiles hundreds of tiny
    one-op programs, which wedged the axon-TPU compile service on GDN eval
    graphs (round-3 rd_report stall — the hang was a bare
    ``convert_element_type`` inside an un-jitted ``codec.decode``).
    Shares the ``_jit_eval_fns`` cache attribute with
    evaluation/pipelines.py so each codec instance compiles each shape once.
    """
    fns = getattr(codec, "_jit_eval_fns", None)
    if fns is None:
        import jax

        fns = (
            jax.jit(codec.encode),
            jax.jit(codec.decode, static_argnames="out_hw"),
        )
        codec._jit_eval_fns = fns
    return fns


def build_tables(codec, params, precision: int | None = None) -> tuple:
    """Quantized CDF tables from the codec's factorized model(s).

    Returns (cdf_y, cdf_c) — or (cdf_y, cdf_c, cdf_zy, cdf_zc) when the codec
    carries a hyperprior (the extra pair codes the transmitted hyper latent).
    Consumers index the first two positionally, so both shapes unpack the
    same way at the main-latent call sites."""
    if precision is None:
        precision = codec.cfg.entropy.cdf_precision
    pmf_y, pmf_c = codec.pmf_tables(params)
    out = (
        cdf_mod.quantize_pmf(np.asarray(pmf_y), precision),
        cdf_mod.quantize_pmf(np.asarray(pmf_c), precision),
    )
    if getattr(codec, "hyper_entropy_y", None) is not None:
        pmf_zy, pmf_zc = codec.hyper_pmf_tables(params)
        out = out + (
            cdf_mod.quantize_pmf(np.asarray(pmf_zy), precision),
            cdf_mod.quantize_pmf(np.asarray(pmf_zc), precision),
        )
    return out


def encode_latent(
    sym: np.ndarray, cdf_y: np.ndarray, cdf_c: np.ndarray, precision: int = 16,
    plane_tables: list | None = None, engine: str = rans.DEFAULT_ENGINE,
) -> list[bytes]:
    """[h,w,3C] uint8 symbols -> 3 independent plane streams [Y, Cb, Cr].

    ``plane_tables`` (optional [t_y, t_cb, t_cr]) overrides the model tables
    — the per-image adaptive path (coding/adaptive.py); cdf_y/cdf_c may then
    be None."""
    tabs = plane_tables or (cdf_y, cdf_c, cdf_c)
    cch = tabs[0].shape[0]
    streams = []
    for p, table in enumerate(tabs):
        plane = np.ascontiguousarray(sym[..., p * cch : (p + 1) * cch])
        streams.append(rans.stream_encode(plane, table, precision, engine))
    return streams


def decode_latent(
    streams: list[bytes],
    lat_hw: tuple[int, int],
    cdf_y: np.ndarray,
    cdf_c: np.ndarray,
    precision: int = 16,
    plane_tables: list | None = None,
    engine: str = rans.DEFAULT_ENGINE,
) -> np.ndarray:
    """Inverse of :func:`encode_latent` -> [h,w,3C] uint8 symbols."""
    h, w = lat_hw
    tabs = plane_tables or (cdf_y, cdf_c, cdf_c)
    cch = tabs[0].shape[0]
    planes = []
    for p, table in enumerate(tabs):
        flat = rans.stream_decode(streams[p], h * w * cch, table, precision, engine)
        planes.append(flat.reshape(h, w, cch))
    return np.concatenate(planes, axis=-1)


# ---------------------------------------- checkerboard-context (two-pass) path


import functools


@functools.lru_cache(maxsize=8)
def _scale_tables(bins: int, smin: float, smax: float, levels: int,
                  precision: int):
    """Static (config-only) conditional-coding tables: (scale_table [S],
    gaussian CDF rows [S, levels+1]). Shared by encoder and decoder with no
    transmission."""
    table = cdf_mod.make_scale_table(bins, smin, smax)
    return table, cdf_mod.gaussian_scale_cdfs(table, levels, precision)


def _codec_scale_tables(codec):
    e = codec.cfg.entropy
    return _scale_tables(
        e.scale_bins, e.scale_min, e.scale_max, codec.levels, e.cdf_precision
    )


def _anchor_mask(h: int, w: int) -> np.ndarray:
    return (np.add.outer(np.arange(h), np.arange(w)) % 2) == 0


def _device_mu_idx(codec, mean, scale):
    """Traced (mean, scale) -> (mu, idx) ON device — the arithmetic twin of
    the host derivation below (round/mod/searchsorted/min are exact integer
    and comparison ops, so device and host evaluation of the same floats
    cannot differ; gated empirically by test_onchip.py's byte-equality).
    Keeping the derivation inside the jitted program shrinks the fetch from
    two f32 grids to two small int grids and removes a host searchsorted
    over the full latent (~80 ms/image on the serving profile)."""
    import jax.numpy as jnp

    scale_table, _ = _codec_scale_tables(codec)
    st = jnp.asarray(np.asarray(scale_table, np.float32))
    mu = jnp.mod(jnp.round(mean).astype(jnp.int32), codec.levels)
    idx = jnp.minimum(
        jnp.searchsorted(st, scale.astype(jnp.float32), side="left"),
        st.shape[0] - 1,
    )
    # u8 outputs: mu < levels <= 256 and idx < scale_bins <= 256 — the
    # decode side fetches these per image, and the tunnel's ~25 MB/s makes
    # the fetch width the decompress wall (4x smaller than int32).
    if codec.levels <= 256 and len(scale_table) <= 256:
        return mu.astype(jnp.uint8), idx.astype(jnp.uint8)
    return mu, idx.astype(jnp.int32)


def _ctx_fn(codec):
    """Jitted (params, sym [1,h,w,3C] uint8) -> full-grid (mu i32, idx i32)
    [h,w,3C] — the checkerboard conditional, derived to coding integers ON
    device (see _device_mu_idx).

    The context nets see only anchor positions (masked inside
    codec.context_params), so running this on the full encoder-side grid and
    on the decoder-side anchors-only grid gives bitwise-identical outputs —
    provided encode and decode run on the same platform (float conv results
    differ across backends; same-process round-trips are always safe). For
    platform-portable containers use codec.deterministic, which swaps this
    for the fixed-point integer twin (coding/detnet.py)."""
    fn = getattr(codec, "_ctx_coding_fn", None)
    if fn is None:
        import jax
        import jax.numpy as jnp

        cch = codec.latent_channels

        def f(params, sym):
            z = sym.astype(jnp.float32)
            my, sy = codec.context_params(params, "y", z[..., :cch])
            zc = jnp.concatenate(
                [z[..., cch : 2 * cch], z[..., 2 * cch :]], axis=0
            )
            mc, sc = codec.context_params(params, "c", zc)
            mean = jnp.concatenate([my, mc[:1], mc[1:]], axis=3)
            scale = jnp.concatenate([sy, sc[:1], sc[1:]], axis=3)
            return _device_mu_idx(codec, mean[0], scale[0])

        fn = jax.jit(f)
        codec._ctx_coding_fn = fn
    return fn


def _full_mu_idx(codec, mean: np.ndarray, scale: np.ndarray):
    """Float-path conditional params -> full-grid (mu int64, idx int32).
    Host twin of :func:`_device_mu_idx` (kept for the detnet comparison
    tests and any caller holding host-side conditionals)."""
    scale_table, _ = _codec_scale_tables(codec)
    mu = np.round(mean).astype(np.int64) % codec.levels
    idx = np.minimum(
        np.searchsorted(scale_table, scale, side="left"),
        len(scale_table) - 1,
    ).astype(np.int32)
    return mu, idx


def _ctx_mu_idx(codec, params, sym: np.ndarray, det: bool):
    """Full-grid (mu, idx) for the checkerboard conditional. ``det`` selects
    the fixed-point integer inference (coding/detnet.py) whose results are
    bit-identical on every platform; the float path is faster (jitted on the
    accelerator) but only decodable on the platform that encoded."""
    if det:
        from neural_network_image_compression_tpu.coding import detnet

        return detnet.det_context_params(codec, params, sym)
    mu, idx = _ctx_fn(codec)(params, sym[None])
    return np.asarray(mu, np.int64), np.asarray(idx)


def encode_latent_ctx(codec, params, sym: np.ndarray, cdf_y, cdf_c,
                      precision: int,
                      plane_tables: list | None = None,
                      engine: str = rans.DEFAULT_ENGINE,
                      det: bool = False,
                      mu_idx: tuple | None = None) -> list[bytes]:
    """[h,w,3C] symbols -> 6 streams: per plane, an anchor stream (factorized
    CDFs — or per-image ``plane_tables`` — existing coder) then a context
    stream (mean-shifted residuals coded with scale-binned Gaussian rows
    through the indexed rANS coder).

    ``mu_idx`` (optional precomputed full-grid conditionals) lets callers
    that encode the same symbols twice — the adaptive-table candidate — pay
    for the context-net evaluation once (it does not depend on the tables;
    the r4 serving profile showed it dominating compress latency)."""
    levels = codec.levels
    tabs = plane_tables or (cdf_y, cdf_c, cdf_c)
    cch = tabs[0].shape[0]
    h, w = sym.shape[:2]
    amask = _anchor_mask(h, w)
    nmask = ~amask
    _, scale_cdfs = _codec_scale_tables(codec)
    mu_full, idx_full = mu_idx or _ctx_mu_idx(codec, params, sym, det)
    streams: list[bytes] = []
    for p, table in enumerate(tabs):
        plane = np.ascontiguousarray(sym[..., p * cch : (p + 1) * cch])
        streams.append(rans.stream_encode(plane[amask], table, precision, engine))
        s = plane[nmask].astype(np.int64)                       # [n_non, C]
        mu = mu_full[..., p * cch : (p + 1) * cch][nmask]
        wsym = ((s - mu + levels // 2) % levels).astype(np.uint8)
        idx = idx_full[..., p * cch : (p + 1) * cch][nmask]
        streams.append(rans.stream_encode_indexed(wsym, idx, scale_cdfs, precision, engine))
    return streams


def decode_latent_ctx(codec, params, streams: list[bytes],
                      lat_hw: tuple[int, int], cdf_y, cdf_c,
                      precision: int,
                      plane_tables: list | None = None,
                      engine: str = rans.DEFAULT_ENGINE,
                      det: bool = False) -> np.ndarray:
    """Inverse of :func:`encode_latent_ctx` -> [h,w,3C] uint8 symbols.
    Pass 1 decodes all anchors; one context-net call (jitted float, or the
    deterministic fixed-point twin when ``det``) then gives every
    non-anchor's conditional parameters for pass 2 (no sequential scan)."""
    levels = codec.levels
    tabs = plane_tables or (cdf_y, cdf_c, cdf_c)
    cch = tabs[0].shape[0]
    h, w = lat_hw
    amask = _anchor_mask(h, w)
    nmask = ~amask
    n_anchor = int(amask.sum())
    sym = np.zeros((h, w, 3 * cch), np.uint8)
    for p, table in enumerate(tabs):
        flat = rans.stream_decode(streams[2 * p], n_anchor * cch, table, precision, engine)
        plane = np.zeros((h, w, cch), np.uint8)
        plane[amask] = flat.reshape(n_anchor, cch)
        sym[..., p * cch : (p + 1) * cch] = plane
    _, scale_cdfs = _codec_scale_tables(codec)
    mu_full, idx_full = _ctx_mu_idx(codec, params, sym, det)
    for p in range(3):
        mu = mu_full[..., p * cch : (p + 1) * cch][nmask]
        idx = idx_full[..., p * cch : (p + 1) * cch][nmask]
        wsym = rans.stream_decode_indexed(streams[2 * p + 1], idx, scale_cdfs, precision, engine)
        s = (wsym.reshape(mu.shape).astype(np.int64) - levels // 2 + mu) % levels
        plane = sym[..., p * cch : (p + 1) * cch]
        plane[nmask] = s.astype(np.uint8)
        sym[..., p * cch : (p + 1) * cch] = plane
    return sym


# ------------------------------------------------- hyperprior (two-stream) path


def _hyper_fns(codec):
    """Jitted hyper coding callables, cached on the codec:
    enc(params, sym[1,h,w,3C]) -> z symbols [1,hz,wz,3Zc] uint8;
    cond(params, z_sym, h, w)  -> (mean, scale) [h,w,3C] in symbol units.
    Both sides run cond on the DECODED z symbols, so encoder/decoder agree
    exactly on the conditional (same-platform float determinism; the
    container CRC catches cross-platform drift loudly)."""
    cached = getattr(codec, "_hyper_coding_fns", None)
    if cached is None:
        import jax
        import jax.numpy as jnp

        cch = codec.latent_channels
        zc = codec.cfg.entropy.hyper_channels
        off = codec.levels // 2

        def enc(params, sym):
            z = sym.astype(jnp.float32)
            zy = codec.hyper_z(params, "y", z[..., :cch])
            zcc = codec.hyper_z(
                params, "c",
                jnp.concatenate([z[..., cch : 2 * cch], z[..., 2 * cch :]], axis=0),
            )
            zall = jnp.concatenate([zy, zcc[:1], zcc[1:]], axis=3)
            return jnp.clip(jnp.round(zall) + off, 0, codec.levels - 1).astype(
                jnp.uint8
            )

        def cond(params, z_sym, h, w):
            zf = z_sym.astype(jnp.float32) - off
            my, sy = codec.hyper_conditional(params, "y", zf[..., :zc], (h, w))
            zcc = jnp.concatenate(
                [zf[..., zc : 2 * zc], zf[..., 2 * zc :]], axis=0
            )
            mc, sc = codec.hyper_conditional(params, "c", zcc, (h, w))
            mean = jnp.concatenate([my, mc[:1], mc[1:]], axis=3)
            scale = jnp.concatenate([sy, sc[:1], sc[1:]], axis=3)
            return _device_mu_idx(codec, mean[0], scale[0])

        cached = (jax.jit(enc), jax.jit(cond, static_argnums=(2, 3)))
        codec._hyper_coding_fns = cached
    return cached


def _hyper_mu_idx(codec, params, z_sym: np.ndarray, lat_hw: tuple[int, int],
                  det: bool):
    """Full-grid (mu, idx) from DECODED hyper symbols — shared by encode and
    decode so both sides condition on identical values. ``det`` selects the
    fixed-point integer hyper-decoder (coding/detnet.py)."""
    if det:
        from neural_network_image_compression_tpu.coding import detnet

        return detnet.det_hyper_conditional(codec, params, z_sym, lat_hw)
    _, cond_fn = _hyper_fns(codec)
    mu, idx = cond_fn(params, z_sym[None], lat_hw[0], lat_hw[1])
    return np.asarray(mu, np.int64), np.asarray(idx)


def hyper_z_symbols(codec, params, sym: np.ndarray) -> np.ndarray:
    """[h,w,3C] main symbols -> [zh,zw,3Zc] uint8 hyper symbols (the jitted
    hyper-encoder pass; encode-side only — decode reads z from the stream)."""
    enc_fn, _ = _hyper_fns(codec)
    return np.asarray(enc_fn(params, sym[None]))[0]


def encode_latent_hyper(codec, params, sym: np.ndarray, tables,
                        precision: int,
                        engine: str = rans.DEFAULT_ENGINE,
                        det: bool = False,
                        z_plane_tables: list | None = None,
                        z_sym: np.ndarray | None = None,
                        mu_idx: tuple | None = None) -> list[bytes]:
    """[h,w,3C] symbols -> 6 streams: per plane, the hyper-latent stream
    (factorized hyper CDFs — or per-image ``z_plane_tables``, in which case
    ``tables`` may be None) then the main stream (dense mean-shifted
    residuals through the scale-indexed Gaussian rANS coder).
    ``mu_idx``: optional precomputed conditionals (see encode_latent_ctx)."""
    levels = codec.levels
    cch = codec.latent_channels
    zc = codec.cfg.entropy.hyper_channels
    h, w = sym.shape[:2]
    if z_sym is None:
        z_sym = hyper_z_symbols(codec, params, sym)
    mu_full, idx_full = mu_idx or _hyper_mu_idx(codec, params, z_sym, (h, w), det)
    _, scale_cdfs = _codec_scale_tables(codec)
    streams: list[bytes] = []
    for p in range(3):
        if z_plane_tables is not None:
            ztab = z_plane_tables[p]
        else:
            ztab = tables[2] if p == 0 else tables[3]
        zplane = np.ascontiguousarray(z_sym[..., p * zc : (p + 1) * zc])
        streams.append(rans.stream_encode(zplane, ztab, precision, engine))
        yplane = sym[..., p * cch : (p + 1) * cch].astype(np.int64)
        mu = mu_full[..., p * cch : (p + 1) * cch]
        wsym = ((yplane - mu + levels // 2) % levels).astype(np.uint8)
        idx = idx_full[..., p * cch : (p + 1) * cch]
        streams.append(
            rans.stream_encode_indexed(
                wsym.reshape(-1, cch),
                np.ascontiguousarray(idx).reshape(-1, cch), scale_cdfs,
                precision, engine,
            )
        )
    return streams


def decode_latent_hyper(codec, params, streams: list[bytes],
                        lat_hw: tuple[int, int], tables,
                        precision: int,
                        engine: str = rans.DEFAULT_ENGINE,
                        det: bool = False,
                        z_plane_tables: list | None = None) -> np.ndarray:
    """Inverse of :func:`encode_latent_hyper`: decode each plane's hyper
    latent, run the hyper-decoder once (jitted, full grid), then decode the
    dense conditional main stream. With ``z_plane_tables`` (embedded
    per-image tables), ``tables`` may be None."""
    from neural_network_image_compression_tpu.models.hyperprior import (
        hyper_grid_hw,
    )

    levels = codec.levels
    cch = codec.latent_channels
    zc = codec.cfg.entropy.hyper_channels
    h, w = lat_hw
    zh, zw = hyper_grid_hw((h, w))
    z_sym = np.zeros((zh, zw, 3 * zc), np.uint8)
    for p in range(3):
        if z_plane_tables is not None:
            ztab = z_plane_tables[p]
        else:
            ztab = tables[2] if p == 0 else tables[3]
        flat = rans.stream_decode(streams[2 * p], zh * zw * zc, ztab, precision, engine)
        z_sym[..., p * zc : (p + 1) * zc] = flat.reshape(zh, zw, zc)
    mu_full, idx_full = _hyper_mu_idx(codec, params, z_sym, (h, w), det)
    _, scale_cdfs = _codec_scale_tables(codec)
    sym = np.zeros((h, w, 3 * cch), np.uint8)
    for p in range(3):
        mu = mu_full[..., p * cch : (p + 1) * cch]
        idx = idx_full[..., p * cch : (p + 1) * cch]
        wsym = rans.stream_decode_indexed(
            streams[2 * p + 1],
            np.ascontiguousarray(idx).reshape(-1, cch), scale_cdfs, precision,
            engine,
        )
        s = (wsym.reshape(h, w, cch).astype(np.int64) - levels // 2 + mu) % levels
        sym[..., p * cch : (p + 1) * cch] = s.astype(np.uint8)
    return sym


# ------------------------------------- joint (hyperprior + checkerboard) path


def _joint_fns(codec):
    """Jitted joint-mode coding callables, cached on the codec:
    hyper_part(params, z_sym[1,zh,zw,3Zc], h, w) -> (mean_h, scale_h,
    raw [h,w,3*2C]) — the anchor conditional and the raw hyper features;
    ctx_part(params, sym[1,h,w,3C], raw) -> (mean_j, scale_j) — the
    non-anchor conditional from [masked anchors ++ raw]. Both stages run on
    DECODED inputs so encoder and decoder agree exactly (same-platform float
    determinism; codec.deterministic swaps in the fixed-point twins)."""
    cached = getattr(codec, "_joint_coding_fns", None)
    if cached is None:
        import jax
        import jax.numpy as jnp

        from neural_network_image_compression_tpu.models.hyperprior import (
            head_geometry,
        )

        cch = codec.latent_channels
        zc = codec.cfg.entropy.hyper_channels
        off = codec.levels // 2
        e = codec.cfg.entropy

        def hyper_part(params, z_sym, h, w):
            zf = z_sym.astype(jnp.float32) - off
            raw_y = codec.hyper_raw(params, "y", zf[..., :zc], (h, w))
            zcc = jnp.concatenate(
                [zf[..., zc : 2 * zc], zf[..., 2 * zc :]], axis=0
            )
            raw_c = codec.hyper_raw(params, "c", zcc, (h, w))
            geom = lambda r: head_geometry(
                r, codec.levels, codec._ctx_mean_span, codec._ctx_scale_init,
                e.scale_min, e.scale_max,
            )
            m_y, s_y = geom(raw_y)
            m_c, s_c = geom(raw_c)
            mean = jnp.concatenate([m_y, m_c[:1], m_c[1:]], axis=3)
            scale = jnp.concatenate([s_y, s_c[:1], s_c[1:]], axis=3)
            raw = jnp.concatenate([raw_y, raw_c[:1], raw_c[1:]], axis=3)
            mu, idx = _device_mu_idx(codec, mean[0], scale[0])
            return mu, idx, raw[0]

        def ctx_part(params, sym, raw):
            z = sym.astype(jnp.float32)
            r2 = 2 * cch
            cin_y = jnp.concatenate(
                [codec._context_input(z[..., :cch]), raw[None, ..., :r2]],
                axis=-1,
            )
            m_y, s_y = codec.context_y.apply({"params": params["context_y"]}, cin_y)
            zcc = jnp.concatenate(
                [z[..., cch : 2 * cch], z[..., 2 * cch :]], axis=0
            )
            raw_c = jnp.concatenate(
                [raw[None, ..., r2 : 2 * r2], raw[None, ..., 2 * r2 :]], axis=0
            )
            cin_c = jnp.concatenate(
                [codec._context_input(zcc), raw_c], axis=-1
            )
            m_c, s_c = codec.context_c.apply({"params": params["context_c"]}, cin_c)
            mean = jnp.concatenate([m_y, m_c[:1], m_c[1:]], axis=3)
            scale = jnp.concatenate([s_y, s_c[:1], s_c[1:]], axis=3)
            return _device_mu_idx(codec, mean[0], scale[0])

        cached = (
            jax.jit(hyper_part, static_argnums=(2, 3)),
            jax.jit(ctx_part),
        )
        codec._joint_coding_fns = cached
    return cached


def _joint_stage1(codec, params, z_sym: np.ndarray, lat_hw: tuple[int, int],
                  det: bool):
    """DECODED hyper symbols -> (mu_h, idx_h, raw) full-grid."""
    if det:
        from neural_network_image_compression_tpu.coding import detnet

        return detnet.det_joint_hyper(codec, params, z_sym, lat_hw)
    hyper_part, _ = _joint_fns(codec)
    mu, idx, raw = hyper_part(params, z_sym[None], lat_hw[0], lat_hw[1])
    return np.asarray(mu, np.int64), np.asarray(idx), raw


def _joint_stage2(codec, params, sym: np.ndarray, raw, det: bool):
    """Full-grid symbols (anchors valid) + stage-1 raw -> (mu_j, idx_j)."""
    if det:
        from neural_network_image_compression_tpu.coding import detnet

        return detnet.det_joint_ctx(codec, params, sym, raw)
    _, ctx_part = _joint_fns(codec)
    mu, idx = ctx_part(params, sym[None], raw)
    return np.asarray(mu, np.int64), np.asarray(idx)


def encode_latent_joint(codec, params, sym: np.ndarray, tables,
                        precision: int,
                        engine: str = rans.DEFAULT_ENGINE,
                        det: bool = False,
                        z_plane_tables: list | None = None,
                        z_sym: np.ndarray | None = None,
                        stages: tuple | None = None) -> list[bytes]:
    """[h,w,3C] symbols -> 9 streams: per plane, the hyper-latent stream
    (factorized hyper CDFs or per-image ``z_plane_tables``), the ANCHOR
    stream (mean-shifted residuals under the hyper Gaussian — the
    checkerboard mode's static factorized tables replaced by a per-position
    conditional), then the NON-ANCHOR stream (residuals under the joint
    context Gaussian).
    ``stages``: optional precomputed (mu_h, idx_h, mu_j, idx_j)
    conditionals (see encode_latent_ctx)."""
    levels = codec.levels
    cch = codec.latent_channels
    zc = codec.cfg.entropy.hyper_channels
    h, w = sym.shape[:2]
    if z_sym is None:
        z_sym = hyper_z_symbols(codec, params, sym)
    if stages is None:
        mu_h, idx_h, raw = _joint_stage1(codec, params, z_sym, (h, w), det)
        mu_j, idx_j = _joint_stage2(codec, params, sym, raw, det)
    else:
        mu_h, idx_h, mu_j, idx_j = stages
    amask = _anchor_mask(h, w)
    nmask = ~amask
    _, scale_cdfs = _codec_scale_tables(codec)
    streams: list[bytes] = []
    for p in range(3):
        if z_plane_tables is not None:
            ztab = z_plane_tables[p]
        else:
            ztab = tables[2] if p == 0 else tables[3]
        zplane = np.ascontiguousarray(z_sym[..., p * zc : (p + 1) * zc])
        streams.append(rans.stream_encode(zplane, ztab, precision, engine))
        plane = sym[..., p * cch : (p + 1) * cch].astype(np.int64)
        for mu_full, idx_full, mask in (
            (mu_h, idx_h, amask), (mu_j, idx_j, nmask),
        ):
            s = plane[mask]
            mu = mu_full[..., p * cch : (p + 1) * cch][mask]
            wsym = ((s - mu + levels // 2) % levels).astype(np.uint8)
            idx = idx_full[..., p * cch : (p + 1) * cch][mask]
            streams.append(
                rans.stream_encode_indexed(wsym, idx, scale_cdfs, precision, engine)
            )
    return streams


def decode_latent_joint(codec, params, streams: list[bytes],
                        lat_hw: tuple[int, int], tables,
                        precision: int,
                        engine: str = rans.DEFAULT_ENGINE,
                        det: bool = False,
                        z_plane_tables: list | None = None) -> np.ndarray:
    """Inverse of :func:`encode_latent_joint` -> [h,w,3C] uint8 symbols.
    Three full-grid passes, no autoregressive scan: decode z, run the hyper
    stage (anchor conditionals + raw features), decode all anchors, run the
    context stage once, decode all non-anchors."""
    from neural_network_image_compression_tpu.models.hyperprior import (
        hyper_grid_hw,
    )

    levels = codec.levels
    cch = codec.latent_channels
    zc = codec.cfg.entropy.hyper_channels
    h, w = lat_hw
    zh, zw = hyper_grid_hw((h, w))
    z_sym = np.zeros((zh, zw, 3 * zc), np.uint8)
    for p in range(3):
        if z_plane_tables is not None:
            ztab = z_plane_tables[p]
        else:
            ztab = tables[2] if p == 0 else tables[3]
        flat = rans.stream_decode(streams[3 * p], zh * zw * zc, ztab, precision, engine)
        z_sym[..., p * zc : (p + 1) * zc] = flat.reshape(zh, zw, zc)
    mu_h, idx_h, raw = _joint_stage1(codec, params, z_sym, (h, w), det)
    amask = _anchor_mask(h, w)
    nmask = ~amask
    _, scale_cdfs = _codec_scale_tables(codec)
    sym = np.zeros((h, w, 3 * cch), np.uint8)
    for p in range(3):
        mu = mu_h[..., p * cch : (p + 1) * cch][amask]
        idx = idx_h[..., p * cch : (p + 1) * cch][amask]
        wsym = rans.stream_decode_indexed(streams[3 * p + 1], idx, scale_cdfs, precision, engine)
        s = (wsym.reshape(mu.shape).astype(np.int64) - levels // 2 + mu) % levels
        plane = sym[..., p * cch : (p + 1) * cch]
        plane[amask] = s.astype(np.uint8)
        sym[..., p * cch : (p + 1) * cch] = plane
    mu_j, idx_j = _joint_stage2(codec, params, sym, raw, det)
    for p in range(3):
        mu = mu_j[..., p * cch : (p + 1) * cch][nmask]
        idx = idx_j[..., p * cch : (p + 1) * cch][nmask]
        wsym = rans.stream_decode_indexed(streams[3 * p + 2], idx, scale_cdfs, precision, engine)
        s = (wsym.reshape(mu.shape).astype(np.int64) - levels // 2 + mu) % levels
        plane = sym[..., p * cch : (p + 1) * cch]
        plane[nmask] = s.astype(np.uint8)
        sym[..., p * cch : (p + 1) * cch] = plane
    return sym


# ------------------------------- channel-wise autoregressive (CHARM) path


def _chan_fn(codec, only_slice: int | None = None):
    """Jitted (params, sym [1,h,w,3C] uint8) -> (mean, scale) — the
    channel-context conditionals, concatenated plane-major:
    [h,w,3*(C - C/S)] covering channels [C/S:] of each plane, or
    [h,w,3*(C/S)] for just slice ``only_slice`` (the progressive decoder's
    per-pass call — one stack instead of all S-1, O(S) total decode work).

    Causality makes these programs serve both sides: slice s's stack reads
    only channels [: s*width] of its plane (models/entropy.py
    ChannelContext), so the decoder can call this on a partially-decoded
    grid and the parameters for the next undecoded slice are bitwise what
    the encoder computed (same platform; use codec.deterministic for
    cross-platform containers)."""
    cache = getattr(codec, "_chan_coding_fns", None)
    if cache is None:
        cache = codec._chan_coding_fns = {}
    fn = cache.get(only_slice)
    if fn is None:
        import jax
        import jax.numpy as jnp

        cch = codec.latent_channels

        def f(params, sym):
            z = sym.astype(jnp.float32)
            my, sy = codec.channel_params(
                params, "y", z[..., :cch], only_slice
            )
            zc = jnp.concatenate(
                [z[..., cch : 2 * cch], z[..., 2 * cch :]], axis=0
            )
            mc, sc = codec.channel_params(params, "c", zc, only_slice)
            mean = jnp.concatenate([my, mc[:1], mc[1:]], axis=3)
            scale = jnp.concatenate([sy, sc[:1], sc[1:]], axis=3)
            return _device_mu_idx(codec, mean[0], scale[0])

        fn = cache[only_slice] = jax.jit(f)
    return fn


def _chan_mu_idx(codec, params, sym: np.ndarray, det: bool,
                 only_slice: int | None = None):
    """(mu, idx) for the channel conditionals: [h,w,3*(C - C/S)] over all
    conditional slices, or [h,w,3*(C/S)] for ``only_slice``."""
    if det:
        from neural_network_image_compression_tpu.coding import detnet

        return detnet.det_channel_params(codec, params, sym, only_slice)
    mu, idx = _chan_fn(codec, only_slice)(params, sym[None])
    return np.asarray(mu, np.int64), np.asarray(idx)


def encode_latent_chan(codec, params, sym: np.ndarray, cdf_y, cdf_c,
                       precision: int,
                       plane_tables: list | None = None,
                       engine: str = rans.DEFAULT_ENGINE,
                       det: bool = False,
                       mu_idx: tuple | None = None) -> list[bytes]:
    """[h,w,3C] symbols -> 3*S streams: per plane, the slice-0 stream
    (factorized CDFs restricted to the first C/S channels — or per-image
    ``plane_tables``) then one conditional stream per later channel slice
    (mean-shifted residuals through the scale-indexed Gaussian coder).
    ``mu_idx``: optional precomputed conditionals (see encode_latent_ctx)."""
    levels = codec.levels
    cch = codec.latent_channels
    n_slices = codec.context_y.num_slices
    width = cch // n_slices
    cw = cch - width  # conditional channels per plane
    if plane_tables is not None:
        tabs = plane_tables
    else:
        tabs = tuple(
            np.ascontiguousarray(t[:width]) for t in (cdf_y, cdf_c, cdf_c)
        )
    _, scale_cdfs = _codec_scale_tables(codec)
    mu_full, idx_full = mu_idx or _chan_mu_idx(codec, params, sym, det)
    streams: list[bytes] = []
    for p, table in enumerate(tabs):
        plane = sym[..., p * cch : (p + 1) * cch]
        streams.append(
            rans.stream_encode(
                np.ascontiguousarray(plane[..., :width]), table, precision,
                engine,
            )
        )
        for s in range(1, n_slices):
            sl = plane[..., s * width : (s + 1) * width].astype(np.int64)
            lo = p * cw + (s - 1) * width
            mu = mu_full[..., lo : lo + width]
            idx = idx_full[..., lo : lo + width]
            wsym = ((sl - mu + levels // 2) % levels).astype(np.uint8)
            streams.append(
                rans.stream_encode_indexed(
                    wsym.reshape(-1, width), idx.reshape(-1, width),
                    scale_cdfs, precision, engine,
                )
            )
    return streams


def decode_latent_chan(codec, params, streams: list[bytes],
                       lat_hw: tuple[int, int], cdf_y, cdf_c,
                       precision: int,
                       plane_tables: list | None = None,
                       engine: str = rans.DEFAULT_ENGINE,
                       det: bool = False) -> np.ndarray:
    """Inverse of :func:`encode_latent_chan` -> [h,w,3C] uint8 symbols.

    S-1 progressive conditional passes, each one dense conv call over the
    whole grid (all three planes at once) — no spatial autoregression."""
    levels = codec.levels
    cch = codec.latent_channels
    n_slices = codec.context_y.num_slices
    width = cch // n_slices
    cw = cch - width
    h, w = lat_hw
    if plane_tables is not None:
        tabs = plane_tables
    else:
        tabs = tuple(
            np.ascontiguousarray(t[:width]) for t in (cdf_y, cdf_c, cdf_c)
        )
    _, scale_cdfs = _codec_scale_tables(codec)
    sym = np.zeros((h, w, 3 * cch), np.uint8)
    for p, table in enumerate(tabs):
        flat = rans.stream_decode(
            streams[p * n_slices], h * w * width, table, precision, engine
        )
        sym[..., p * cch : p * cch + width] = flat.reshape(h, w, width)
    for s in range(1, n_slices):
        # One conditional-net call per pass, computing ONLY slice s's stack
        # (channels [: s*width] of every plane are decoded, which is all it
        # reads) — O(S) total decode conv work, not O(S^2).
        mu_s, idx_s = _chan_mu_idx(codec, params, sym, det, only_slice=s)
        for p in range(3):
            lo = p * width
            mu = mu_s[..., lo : lo + width]
            idx = idx_s[..., lo : lo + width]
            wsym = rans.stream_decode_indexed(
                streams[p * n_slices + s], idx.reshape(-1, width),
                scale_cdfs, precision, engine,
            )
            vals = (
                wsym.reshape(mu.shape).astype(np.int64) - levels // 2 + mu
            ) % levels
            sym[..., p * cch + s * width : p * cch + (s + 1) * width] = (
                vals.astype(np.uint8)
            )
    return sym


def _png_stream(sym: np.ndarray) -> bytes:
    """Optimized-PNG bytes of the packed 3-plane latent — the reference's
    exact bitstream (reference tf2_0/src/utils.py:38-43), embedded as a
    container stream so the mode decision is per image."""
    import io

    from PIL import Image

    from neural_network_image_compression_tpu.ops.pack import pack_planes

    packed = np.asarray(pack_planes(sym[None].astype(np.int32)))[0].astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(packed).save(buf, format="PNG", optimize=True)
    return buf.getvalue()


def compress_image(codec, params, rgb_u8: np.ndarray, tables=None,
                   password: str | None = None, mode: str | None = None) -> bytes:
    """uint8 [H,W,3] -> container bytes.

    ``mode`` (default ``codec.cfg.codec.bitstream``):
    - 'rans': per-plane rANS streams (two-pass when the checkerboard context
      is enabled).
    - 'auto': also build the reference's packed-latent optimized-PNG stream
      and emit whichever is smaller — rate <= the reference's own coder on
      identical latents, by construction (real codecs' mode decision).
    With ``password``, the container is wrapped in the authenticated stream
    cipher from coding/crypto.py (the reference's advertised-but-missing
    encryption capability)."""
    encode_fn, _ = jitted_codec_fns(codec)
    sym = np.asarray(encode_fn(params, rgb_u8[None]))[0]
    return compress_symbols(
        codec, params, sym, rgb_u8.shape[:2], tables=tables,
        password=password, mode=mode,
    )


def compress_symbols(codec, params, sym: np.ndarray,
                     orig_hw: tuple[int, int], tables=None,
                     password: str | None = None,
                     mode: str | None = None) -> bytes:
    """Entropy-code pre-computed latent symbols [h,w,3C] -> container bytes.

    The split from :func:`compress_image` lets batched drivers run ONE jitted
    analysis pass over a whole batch of images, then fan the per-image host
    entropy coding out over threads (the C++ rANS coder releases the GIL)."""
    from neural_network_image_compression_tpu.coding.adaptive import (
        plane_histogram_cdf,
        serialize_cdf,
    )

    precision = codec.cfg.entropy.cdf_precision
    engine = getattr(codec.cfg.codec, "coder", rans.DEFAULT_ENGINE)
    joint = (
        codec.cfg.entropy.context == "joint"
        and getattr(codec, "hyper_enc_y", None) is not None
    )
    chan = (
        codec.cfg.entropy.context == "channel" and codec.context_y is not None
    )
    ctx = codec.context_y is not None and not joint and not chan
    hyper = getattr(codec, "hyper_enc_y", None) is not None and not joint
    det_cfg = bool(getattr(codec.cfg.codec, "deterministic", False))
    det = det_cfg and (ctx or hyper or joint or chan)
    # Deterministic containers must be self-describing for EVERY stream that
    # would otherwise be coded with model tables: the factorized CDFs come
    # from a JAX float evaluation (codec.pmf_tables) whose last-ulp results
    # differ across XLA backends, so a decoder on another platform could
    # rebuild different quantized tables and desync the rANS state (ADVICE
    # r2). force_embed therefore transmits exact per-image histogram tables
    # (pure-numpy, platform-independent) unconditionally — no encoder-side
    # size decision; portability is the point (and the tables usually win on
    # rate anyway, RESULTS.md §1).
    force_embed = det_cfg
    adaptive_cfg = bool(getattr(codec.cfg.entropy, "adaptive_tables", False))
    adaptive = False

    def interleave(table_blobs, data):
        per = len(data) // 3
        out = []
        for p in range(3):
            out.append(table_blobs[p])
            out.extend(data[per * p : per * (p + 1)])
        return out

    if hyper or joint:
        encode_fn = encode_latent_joint if joint else encode_latent_hyper
        z_sym = hyper_z_symbols(codec, params, sym)
        # One conditional evaluation regardless of how many table candidates
        # get encoded: the context/hyper nets dominate compress latency (r4
        # serving profile) and their output is table-independent.
        if joint:
            mu_h, idx_h, raw = _joint_stage1(
                codec, params, z_sym, sym.shape[:2], det
            )
            mu_j, idx_j = _joint_stage2(codec, params, sym, raw, det)
            cond_kw = {"stages": (mu_h, idx_h, mu_j, idx_j)}
        else:
            cond_kw = {
                "mu_idx": _hyper_mu_idx(codec, params, z_sym, sym.shape[:2], det)
            }
        candidate = None
        if force_embed or adaptive_cfg:
            zc = codec.cfg.entropy.hyper_channels
            z_tabs = [
                plane_histogram_cdf(
                    z_sym[..., p * zc : (p + 1) * zc], codec.levels, precision
                )
                for p in range(3)
            ]
            z_blobs = [serialize_cdf(t, precision) for t in z_tabs]
            emb = encode_fn(
                codec, params, sym, None, precision, engine, det=det,
                z_plane_tables=z_tabs, z_sym=z_sym, **cond_kw,
            )
            candidate = interleave(z_blobs, emb)
        if force_embed:
            streams, adaptive = candidate, True
        else:
            if tables is None:
                tables = build_tables(codec, params)
            streams = encode_fn(
                codec, params, sym, tables, precision, engine, det=det,
                z_sym=z_sym, **cond_kw,
            )
            if candidate is not None and (
                sum(map(len, candidate)) + 4 * 3 < sum(map(len, streams))
            ):
                streams, adaptive = candidate, True
    else:
        if tables is None and not force_embed:
            tables = build_tables(codec, params)
        cdf_y, cdf_c = (tables[0], tables[1]) if tables is not None else (None, None)

        # One conditional evaluation shared by the model-table encode and the
        # adaptive-table candidate (table-independent; r4 serving profile).
        if chan:
            cond = _chan_mu_idx(codec, params, sym, det)
        elif ctx:
            cond = _ctx_mu_idx(codec, params, sym, det)
        else:
            cond = None

        def encode_with(plane_tables):
            if chan:
                return encode_latent_chan(
                    codec, params, sym, cdf_y, cdf_c, precision, plane_tables,
                    engine, det=det, mu_idx=cond,
                )
            if ctx:
                return encode_latent_ctx(
                    codec, params, sym, cdf_y, cdf_c, precision, plane_tables,
                    engine, det=det, mu_idx=cond,
                )
            return encode_latent(
                sym, cdf_y, cdf_c, precision, plane_tables, engine
            )

        def embedded_candidate():
            cch = codec.latent_channels
            amask = _anchor_mask(*sym.shape[:2]) if ctx else None
            if chan:
                # only the slice-0 channels are factorized-coded
                width = cch // codec.context_y.num_slices
                sel = [
                    sym[..., p * cch : p * cch + width] for p in range(3)
                ]
            else:
                sel = [sym[..., p * cch : (p + 1) * cch] for p in range(3)]
            plane_tables = [
                plane_histogram_cdf(
                    sel[p], codec.levels, precision, mask=amask,
                )
                for p in range(3)
            ]
            blobs = [serialize_cdf(t, precision) for t in plane_tables]
            return interleave(blobs, encode_with(plane_tables))

        if force_embed:
            streams, adaptive = embedded_candidate(), True
        else:
            streams = encode_with(None)
            if adaptive_cfg:
                # Encoder-side decision (like the 'auto' PNG choice):
                # per-image tables win on statistics mismatch but cost
                # ~10 B/channel — emit them only when the total shrinks.
                # Decode is self-describing via flag bit3 either way.
                candidate = embedded_candidate()
                if sum(map(len, candidate)) + 4 * 3 < sum(map(len, streams)):
                    streams, adaptive = candidate, True
    if mode is None:
        mode = codec.cfg.codec.bitstream
    n_slices = codec.context_y.num_slices if chan else 0
    if chan:
        passes = n_slices + (1 if adaptive else 0)
    elif joint:
        passes = 3 + (1 if adaptive else 0)
    else:
        passes = 1 + (1 if (ctx or hyper) else 0) + (1 if adaptive else 0)
    kind, n_planes = "rans", 3
    if mode == "auto":
        png = _png_stream(sym)
        if len(png) < sum(len(b) for b in streams):
            streams, kind, passes, n_planes = [png], "png", 1, 1
            hyper = False
            joint = False
            adaptive = False
            det = False
            n_slices = 0
    import zlib

    header = ContainerHeader(
        model_id=codec.cfg.codec.model_id,
        colorspace=codec.colorspace.name,
        levels=codec.levels,
        latent_channels=codec.latent_channels,
        orig_h=orig_hw[0],
        orig_w=orig_hw[1],
        lat_h=sym.shape[0],
        lat_w=sym.shape[1],
        n_planes=n_planes,
        passes=passes,
        kind=kind,
        hyper=hyper or joint,
        joint=joint,
        channel_slices=n_slices,
        adaptive=adaptive,
        coder=engine if kind == "rans" else "rans32",
        det=det,
        # Decode verifies this (ADVICE r1): the two-pass context streams
        # recompute conv outputs at decode; on the float path a cross-
        # platform numeric drift must fail loudly instead of silently
        # corrupting the image (the det path makes drift impossible by
        # construction — coding/detnet.py — and keeps the CRC as backstop).
        # 'lane' containers use the order-independent on-chip checksum
        # (lane.checksum_u32) so the fused batch path never has to fetch
        # the symbol grid just to hash it.
        sym_crc=(
            _lane_checksum(sym)
            if (kind == "rans" and engine == "lane")
            else zlib.crc32(np.ascontiguousarray(sym).tobytes()) or 1
        ),
    )
    blob = pack_container(header, streams)
    if password is not None:
        from neural_network_image_compression_tpu.coding.crypto import encrypt

        blob = encrypt(blob, password)
    return blob


def decompress_image(codec, params, data: bytes, tables=None,
                     password: str | None = None) -> np.ndarray:
    """Container bytes -> uint8 [H,W,3] reconstruction."""
    header, sym = decompress_symbols(codec, params, data, tables, password)
    _, decode_fn = jitted_codec_fns(codec)
    rgb = decode_fn(params, sym[None], out_hw=(header.orig_h, header.orig_w))
    return np.asarray(rgb)[0]


def decompress_symbols(codec, params, data: bytes, tables=None,
                       password: str | None = None):
    """Container bytes -> (header, latent symbols [h,w,3C] uint8): everything
    except the final synthesis pass. Split out so batched drivers
    (coding/onchip.py decompress_batch) can thread the host entropy decode
    per image and run ONE jitted synthesis over the whole batch."""
    from neural_network_image_compression_tpu.coding.crypto import decrypt, is_encrypted

    if is_encrypted(data):
        if password is None:
            raise ValueError("container is encrypted; password required")
        data = decrypt(data, password)
    header, streams = unpack_container(data)
    if header.kind == "png":
        import io

        from PIL import Image

        from neural_network_image_compression_tpu.ops.pack import unpack_planes

        packed = np.asarray(Image.open(io.BytesIO(streams[0])))
        sym = np.asarray(unpack_planes(packed[None].astype(np.int32)))[0]
        return header, sym.astype(np.uint8)
    # Model tables are only needed when some stream is coded with them:
    # adaptive containers are self-describing (embedded per-image tables for
    # the anchor streams — or, under a hyperprior, for the z streams), which
    # is also what makes det containers decodable on any platform without a
    # JAX table evaluation.
    needs_model_tables = not header.adaptive
    if tables is None and needs_model_tables:
        tables = build_tables(codec, params)
    cdf_y, cdf_c = (tables[0], tables[1]) if tables is not None else (None, None)
    precision = codec.cfg.entropy.cdf_precision
    plane_tables = None
    z_plane_tables = None
    if header.adaptive:
        from neural_network_image_compression_tpu.coding.adaptive import (
            deserialize_cdf,
        )

        per = header.passes
        if header.hyper:
            table_ch = codec.cfg.entropy.hyper_channels
        elif header.channel_slices:
            table_ch = header.latent_channels // header.channel_slices
        else:
            table_ch = header.latent_channels
        parsed = [
            deserialize_cdf(
                streams[p * per], table_ch, header.levels, precision,
            )
            for p in range(3)
        ]
        streams = [s for i, s in enumerate(streams) if i % per != 0]
        if header.hyper:
            z_plane_tables = parsed
        else:
            plane_tables = parsed
            if cdf_y is None:
                # shape-compatible placeholders: the decode paths below read
                # only .shape[0] from these when plane_tables override them
                cdf_y = cdf_c = plane_tables[0]
    conditional = header.passes - 1 - (1 if header.adaptive else 0)
    engine = header.coder
    if header.channel_slices:
        want = (
            codec.context_y.num_slices
            if codec.cfg.entropy.context == "channel" and codec.context_y
            is not None
            else 0
        )
        if want != header.channel_slices:
            raise ValueError(
                f"container uses a {header.channel_slices}-slice channel "
                f"context but the codec is configured with "
                f"{want or 'no channel context'}"
            )
        sym = decode_latent_chan(
            codec, params, streams, (header.lat_h, header.lat_w),
            cdf_y, cdf_c, precision, plane_tables, engine, det=header.det,
        )
    elif header.joint:
        sym = decode_latent_joint(
            codec, params, streams, (header.lat_h, header.lat_w),
            tables, precision, engine, det=header.det,
            z_plane_tables=z_plane_tables,
        )
    elif header.hyper:
        sym = decode_latent_hyper(
            codec, params, streams, (header.lat_h, header.lat_w),
            tables, precision, engine, det=header.det,
            z_plane_tables=z_plane_tables,
        )
    elif conditional == 1:
        sym = decode_latent_ctx(
            codec, params, streams, (header.lat_h, header.lat_w),
            cdf_y, cdf_c, precision, plane_tables, engine, det=header.det,
        )
    else:
        sym = decode_latent(
            streams, (header.lat_h, header.lat_w), cdf_y, cdf_c, precision,
            plane_tables, engine,
        )
    if header.sym_crc:
        import zlib

        if header.coder == "lane":
            got = _lane_checksum(sym)
        else:
            got = zlib.crc32(np.ascontiguousarray(sym).tobytes()) or 1
        if got != header.sym_crc:
            raise ValueError(
                "latent symbol checksum mismatch: the decoder reproduced "
                "different symbols than the encoder wrote (two-pass context "
                "decode requires the same numeric platform as encode)"
            )
    return header, sym

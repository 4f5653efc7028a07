import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Stage-by-stage breakdown of the batched serving chain (VERDICT r4 item 1:
'profile the compress chain and report the split').

Times, for a batch of kodim21-size images on the current device:
  encode      batched jitted analysis+quantize (sym fetched to host)
  ctx         N per-image conditional dispatches (device mu/idx)
  lane        the fused lane-scan program (+ packed-word fetch)
  assemble    host byte assembly + container packing (the remainder)
  total       compress_batch wall time
and the decode side: threaded decompress_symbols vs the batched synthesis.

Usage: python scripts/serving_breakdown.py [--run runs_r3/gdn_l001]
                                           [--batch 64] [--reps 3]
"""
import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs_r3/gdn_l001")
    p.add_argument("--image", default="/root/reference/data/kodak_img/kodim21.png")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/nnic_jax_cache"),
    )
    from neural_network_image_compression_tpu.cli import _load_run
    from neural_network_image_compression_tpu.coding import (
        build_tables,
        compress_batch,
        decompress_batch,
    )
    from neural_network_image_compression_tpu.coding import codec_stream as cs
    from neural_network_image_compression_tpu.coding import onchip
    from neural_network_image_compression_tpu.data.io import load_image
    from neural_network_image_compression_tpu.models import NeuralCodec

    img = load_image(args.image)
    imgs = np.stack([img] * args.batch)
    codec0, params = _load_run(args.run)
    cfg = codec0.cfg.replace(
        codec=dataclasses.replace(codec0.cfg.codec, coder="lane"),
        entropy=dataclasses.replace(codec0.cfg.entropy, adaptive_tables=False),
    )
    codec = NeuralCodec(cfg)
    tables = build_tables(codec, params)
    n = args.batch

    # warm everything
    blobs = compress_batch(codec, params, imgs, tables=tables)
    decompress_batch(codec, params, blobs, tables=tables)

    enc_jit, dec_jit = cs.jitted_codec_fns(codec)
    imgs_d = jnp.asarray(imgs)

    def timed(f):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = f()
        return (time.perf_counter() - t0) / args.reps, r

    # encode: batched forward, fetch symbols
    t_enc, sym_host = timed(lambda: np.asarray(enc_jit(params, imgs_d)))
    sym_d = enc_jit(params, imgs_d)

    # ctx: N per-image conditional dispatches, block on the last
    ctx_fn = cs._ctx_fn(codec)

    def run_ctx():
        outs = [ctx_fn(params, sym_d[i : i + 1]) for i in range(n)]
        jax.block_until_ready(outs[-1])
        np.asarray(outs[-1][0])  # force one fetch-scale sync
        return outs

    t_ctx, ctx_outs = timed(run_ctx)

    # lane: the fused (merged-scan) program + packed fetch
    _, scale_cdfs = cs._codec_scale_tables(codec)
    cdf_yc = np.concatenate([tables[0], tables[1]], axis=0)
    fn, stream_ks, n_streams = onchip._fused_lane_fn(
        codec, n, tuple(sym_d.shape[1:3])
    )
    mu = jnp.stack([o[0] for o in ctx_outs])
    idx = jnp.stack([o[1] for o in ctx_outs])
    cdf_yc_d = jnp.asarray(cdf_yc)
    sc_d = jnp.asarray(np.ascontiguousarray(scale_cdfs, np.uint32))

    def run_lane():
        outs, chks = fn(sym_d, cdf_yc_d, sc_d, mu, idx)
        f = onchip._fetch_packed(outs)
        np.asarray(chks)
        return f

    t_lane, _ = timed(run_lane)

    t_total, blobs = timed(
        lambda: compress_batch(codec, params, imgs, tables=tables)
    )
    px = img.shape[0] * img.shape[1]
    print(json.dumps({
        "phase": "compress", "batch": n,
        "total_ms_per_image": round(1e3 * t_total / n, 2),
        "encode_ms_per_image": round(1e3 * t_enc / n, 2),
        "ctx_ms_per_image": round(1e3 * t_ctx / n, 2),
        "lane_ms_per_image": round(1e3 * t_lane / n, 2),
        "assemble_ms_per_image": round(
            1e3 * max(t_total - t_enc - t_ctx - t_lane, 0) / n, 2
        ),
        "images_per_s": round(n / t_total, 2),
        "bpp": round(8 * sum(map(len, blobs)) / (px * n), 4),
    }))

    # decode side
    t_sym, pairs = timed(lambda: [
        cs.decompress_symbols(codec, params, b, tables) for b in blobs[:8]
    ])
    t_dec_total, outs = timed(
        lambda: decompress_batch(codec, params, blobs, tables=tables)
    )
    syms = jnp.asarray(np.stack([p[1] for p in pairs]))
    t_syn, _ = timed(
        lambda: np.asarray(dec_jit(params, syms, out_hw=img.shape[:2]))
    )
    print(json.dumps({
        "phase": "decompress", "batch": n,
        "total_ms_per_image": round(1e3 * t_dec_total / n, 2),
        "symbols_serial_ms_per_image": round(1e3 * t_sym / 8, 2),
        "synthesis_ms_per_image_batch8": round(1e3 * t_syn / 8, 2),
        "images_per_s": round(n / t_dec_total, 2),
    }))


if __name__ == "__main__":
    main()

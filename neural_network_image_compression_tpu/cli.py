"""Command-line entry points.

Replaces the reference's argv-parsed test scripts (reference
tf1_13/tests/test_training.py, test_encoder.py, test_decoder.py,
calc_ssim.py) with one typed CLI:

    python -m neural_network_image_compression_tpu train --data DIR --val DIR
    python -m neural_network_image_compression_tpu compress --input DIR --run RUN_DIR
    python -m neural_network_image_compression_tpu decompress --input DIR --run RUN_DIR
    python -m neural_network_image_compression_tpu eval --orig DIR --recon DIR
    python -m neural_network_image_compression_tpu rd --input DIR --run RUN_DIR
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _load_run(run_dir: str, adaptive: bool | None = None,
              deterministic: bool | None = None,
              coder: str | None = None):
    """(codec, params) from a training run directory's latest checkpoint.

    ``adaptive`` overrides the stored entropy.adaptive_tables and
    ``deterministic`` the stored codec.deterministic — both pure coding-time
    options (per-image tables / fixed-point portable conditionals), safe to
    flip on runs trained before they existed."""
    import jax

    from neural_network_image_compression_tpu.config import Config
    from neural_network_image_compression_tpu.models import NeuralCodec
    from neural_network_image_compression_tpu.training import CheckpointStore
    from neural_network_image_compression_tpu.training.train_step import (
        init_train_state,
    )

    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    if adaptive is not None:
        cfg = dataclasses.replace(
            cfg, entropy=dataclasses.replace(cfg.entropy, adaptive_tables=adaptive)
        )
    if deterministic is not None:
        cfg = dataclasses.replace(
            cfg, codec=dataclasses.replace(cfg.codec, deterministic=deterministic)
        )
    if coder is not None:
        cfg = dataclasses.replace(
            cfg, codec=dataclasses.replace(cfg.codec, coder=coder)
        )
    codec = NeuralCodec(cfg)
    store = CheckpointStore(os.path.join(run_dir, "checkpoints"))
    template = init_train_state(codec, jax.random.key(0), cfg)
    restored = store.restore(template)
    if restored is None:
        raise SystemExit(f"no checkpoint found under {run_dir}/checkpoints")
    state, _ = restored
    return codec, jax.device_get(state.params)


def _build_config(args) -> "Config":
    from neural_network_image_compression_tpu.config import (
        CodecConfig,
        Config,
        DataConfig,
        EntropyConfig,
        ModelConfig,
        QuantizerConfig,
        TrainConfig,
        reference_faithful,
    )

    if getattr(args, "reference_faithful", False):
        cfg = reference_faithful()
    elif getattr(args, "tpu_native", False):
        from neural_network_image_compression_tpu.config import tpu_native

        cfg = tpu_native(rd_lambda=args.rd_lambda)
    else:
        cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            preset=args.preset,
            compute_dtype=args.compute_dtype or cfg.model.compute_dtype,
            activation=getattr(args, "activation", None) or cfg.model.activation,
            convt=getattr(args, "convt", None) or cfg.model.convt,
        ),
        data=dataclasses.replace(cfg.data, train_dir=args.data, val_dir=args.val),
        entropy=dataclasses.replace(
            cfg.entropy,
            context=getattr(args, "entropy_context", None)
            or cfg.entropy.context,
        ),
        quantizer=dataclasses.replace(
            cfg.quantizer,
            surrogate=getattr(args, "surrogate", None) or cfg.quantizer.surrogate,
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=args.batch_size,
            max_epochs=args.epochs,
            rd_lambda=args.rd_lambda,
            rd_lambda_step=(
                args.rd_lambda_step
                if args.rd_lambda_step is not None
                else cfg.train.rd_lambda_step
            ),
            distortion=args.distortion,
            mosaic=getattr(args, "mosaic", None) or cfg.train.mosaic,
            grad_clip_norm=(
                getattr(args, "grad_clip", None)
                if getattr(args, "grad_clip", None) is not None
                else cfg.train.grad_clip_norm
            ),
            gdn_lr_scale=(
                getattr(args, "gdn_lr_scale", None)
                if getattr(args, "gdn_lr_scale", None) is not None
                else cfg.train.gdn_lr_scale
            ),
            ste_warmup_steps=(
                getattr(args, "ste_warmup_steps", None)
                if getattr(args, "ste_warmup_steps", None) is not None
                else cfg.train.ste_warmup_steps
            ),
            freeze_transforms=getattr(args, "freeze_transforms", False),
            **(
                {"val_every_steps": args.val_every_steps}
                if getattr(args, "val_every_steps", None) is not None
                else {}
            ),
        ),
        codec=dataclasses.replace(
            cfg.codec, bitstream=args.bitstream or cfg.codec.bitstream
        ),
    )
    return cfg


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="neural_network_image_compression_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="rate-distortion training")
    p_train.add_argument("--data", required=True)
    p_train.add_argument("--val", default="/root/reference/data/kodak_img")
    p_train.add_argument("--run-dir", default="runs/default")
    p_train.add_argument("--epochs", type=int, default=30)
    p_train.add_argument("--batch-size", type=int, default=64)
    p_train.add_argument("--rd-lambda", type=float, default=0.01, dest="rd_lambda")
    p_train.add_argument("--rd-lambda-step", type=float, default=None,
                         dest="rd_lambda_step",
                         help="lambda increment per epoch (0 = fixed lambda; "
                              "default: the config preset's step)")
    p_train.add_argument("--preset", choices=["base", "deep"], default="base")
    p_train.add_argument("--distortion", choices=["ssim", "ms_ssim", "mse"], default="ssim")
    p_train.add_argument("--bitstream", choices=["rans", "png", "auto"], default=None,
                         help="default: config preset's mode (rans; png when "
                              "--reference-faithful)")
    p_train.add_argument("--entropy-context",
                         choices=["none", "checkerboard", "hyperprior",
                                  "joint", "channel"],
                         default=None, dest="entropy_context",
                         help="conditional rate model "
                              "(default: the config preset's setting)")
    p_train.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                         default=None,
                         help="default: the config preset's dtype")
    p_train.add_argument("--activation",
                         choices=["preset_default", "leaky_relu", "prelu", "gdn"],
                         default=None,
                         help="transform activation override; 'gdn' = divisive "
                              "normalization (IGDN in synthesis), beyond-"
                              "reference R-D preset")
    p_train.add_argument("--convt", choices=["xla", "subpixel"], default=None,
                         help="stride-2 transposed-conv engine (see "
                              "ModelConfig.convt; 'xla' measures faster on "
                              "v5e, RESULTS.md section 8.9)")
    p_train.add_argument("--surrogate", choices=["noise", "ste", "noise+ste"],
                         default=None,
                         help="decoder-side quantization surrogate "
                              "(default: the config preset's)")
    p_train.add_argument("--gdn-lr-scale", type=float, default=None,
                         dest="gdn_lr_scale",
                         help="lr multiplier for GDN beta/gamma params only "
                              "(GDN+STE stabilizer)")
    p_train.add_argument("--ste-warmup-steps", type=int, default=None,
                         dest="ste_warmup_steps",
                         help="with --surrogate noise+ste: steps of noise "
                              "surrogate before switching to STE")
    p_train.add_argument("--grad-clip", type=float, default=None,
                         dest="grad_clip",
                         help="global-norm gradient clipping (stabilizer "
                              "for GDN+STE)")
    p_train.add_argument("--mosaic", type=int, default=None,
                         help="G>1: train on GxG patch mosaics ((G*128)^2 "
                              "crops) — larger-crop training for hyper-side "
                              "context generalization")
    p_train.add_argument("--max-steps", type=int, default=None)
    p_train.add_argument("--val-every-steps", type=int, default=None,
                         dest="val_every_steps",
                         help="override validation cadence (steps)")
    p_train.add_argument("--resume", action="store_true")
    p_train.add_argument("--init-from", default=None, dest="init_from",
                         help="warm-start params from another run dir")
    p_train.add_argument("--freeze-transforms", action="store_true",
                         dest="freeze_transforms",
                         help="train only the entropy/context nets")
    p_train.add_argument("--reference-faithful", action="store_true")
    p_train.add_argument("--tpu-native", action="store_true", dest="tpu_native",
                         help="flagship preset: unbounded integer-grid latent "
                              "+ checkerboard context + bf16 (config.tpu_native)")
    p_train.add_argument("--data-parallel", type=int, default=0,
                         help="shard training over N devices (0 = single device)")
    p_train.add_argument("--distributed", action="store_true",
                         help="multi-host: initialize jax.distributed first "
                              "(same command on every host; coordinator via "
                              "JAX_COORDINATOR_ADDRESS/JAX_PROCESS_ID/"
                              "JAX_NUM_PROCESSES or cloud auto-detect), then "
                              "build the pod mesh over all hosts' devices")

    p_comp = sub.add_parser("compress", help="compress an image directory")
    p_comp.add_argument("--input", required=True)
    p_comp.add_argument("--run", required=True, help="training run dir with checkpoints")
    p_comp.add_argument("--output", default=None)
    p_comp.add_argument("--password", default=None,
                        help="encrypt containers (authenticated stream cipher)")
    p_comp.add_argument("--coder", choices=["rans32", "rans64", "lane"],
                        default=None,
                        help="stream engine override: 'lane' runs the rANS "
                             "encode loop on the accelerator "
                             "(coding/lane.py; container v3)")
    p_comp.add_argument("--adaptive", action="store_true", default=None,
                        help="embed per-image CDF tables when they shrink the "
                             "container (coding-time only; overrides the "
                             "run's stored config)")
    p_comp.add_argument("--deterministic", action="store_true", default=None,
                        help="fixed-point conditional inference: containers "
                             "decode bit-exactly on any platform "
                             "(coding/detnet.py; tiny rate cost)")

    p_dec = sub.add_parser("decompress", help="decompress a bitstream directory")
    p_dec.add_argument("--input", required=True)
    p_dec.add_argument("--run", required=True)
    p_dec.add_argument("--output", default=None)
    p_dec.add_argument("--password", default=None)

    p_eval = sub.add_parser("eval", help="PSNR/MS-SSIM between two directories")
    p_eval.add_argument("--orig", required=True)
    p_eval.add_argument("--recon", required=True)

    p_rd = sub.add_parser("rd", help="rate-distortion point for a directory")
    p_rd.add_argument("--input", required=True)
    p_rd.add_argument("--run", required=True)
    p_rd.add_argument("--adaptive", action="store_true", default=None,
                      help="per-image CDF tables (see compress --adaptive)")
    p_rd.add_argument("--serial", action="store_true",
                      help="one un-batched dispatch per image (default: "
                           "shape-grouped jitted batches + threaded coding)")
    p_rd.add_argument("--batch-size", type=int, default=8)

    p_anchor = sub.add_parser("anchors", help="JPEG/PNG classical R-D anchors")
    p_anchor.add_argument("--input", required=True)
    p_anchor.add_argument("--qualities", default="10,25,50,75,90")

    p_tb = sub.add_parser(
        "tb", help="convert a run's metrics.jsonl to TensorBoard event files"
    )
    p_tb.add_argument("--run", required=True, help="run dir with metrics.jsonl")
    p_tb.add_argument("--out", default=None, help="event dir (default <run>/tb)")

    p_build = sub.add_parser("build-data", help="build a training patch set")
    src = p_build.add_mutually_exclusive_group(required=True)
    src.add_argument("--source", default=None,
                     help="local image directory source")
    src.add_argument("--url-list", default=None, dest="url_list",
                     help="URL-list file (fall11_urls '<id>\\t<url>' lines "
                          "or bare URLs; file:// works) — the reference's "
                          "ImageNet crawl path (imagenet_download.ipynb)")
    p_build.add_argument("--output", required=True)
    p_build.add_argument("--patch-size", type=int, default=128)
    p_build.add_argument("--limit", type=int, default=None)
    p_build.add_argument("--workers", type=int, default=12)

    args = parser.parse_args(argv)

    if args.cmd == "train":
        from neural_network_image_compression_tpu.training import Trainer

        cfg = _build_config(args)
        mesh = None
        if args.distributed:
            from neural_network_image_compression_tpu.parallel import (
                global_mesh,
                initialize_distributed,
                process_info,
            )

            initialize_distributed()
            print(f"distributed: {process_info()}")
            mesh = global_mesh(data=args.data_parallel or None)
        elif args.data_parallel:
            from neural_network_image_compression_tpu.parallel import make_mesh

            mesh = make_mesh(data=args.data_parallel)
        trainer = Trainer(cfg, run_dir=args.run_dir, mesh=mesh)
        trainer.fit(
            max_steps=args.max_steps,
            resume=args.resume,
            init_from=args.init_from,
        )
        return 0

    if args.cmd == "compress":
        from neural_network_image_compression_tpu.evaluation import compress_directory

        codec, params = _load_run(
            args.run, adaptive=args.adaptive, deterministic=args.deterministic,
            coder=args.coder,
        )
        results = compress_directory(
            codec, params, args.input, args.output, password=args.password
        )
        for r in results:
            print(f"{r.name}\t{r.num_bytes} B\t{r.bpp:.4f} bpp")
        return 0

    if args.cmd == "decompress":
        from neural_network_image_compression_tpu.evaluation import decompress_directory

        codec, params = _load_run(args.run)
        written = decompress_directory(
            codec, params, args.input, args.output, password=args.password
        )
        for path in written:
            print(path)
        return 0

    if args.cmd == "eval":
        from neural_network_image_compression_tpu.evaluation import evaluate_directories

        result = evaluate_directories(args.orig, args.recon)
        for stem, v in result["per_file"].items():
            print(f"{stem}\tpsnr {v['psnr']:.2f}\tms-ssim {v['ms_ssim']:.4f}")
        print(json.dumps({k: v for k, v in result.items() if k != "per_file"}))
        return 0

    if args.cmd == "rd":
        from neural_network_image_compression_tpu.evaluation import (
            rd_point,
            rd_point_batched,
        )

        codec, params = _load_run(args.run, adaptive=args.adaptive)
        if args.serial:
            result = rd_point(codec, params, args.input)
        else:
            result = rd_point_batched(
                codec, params, args.input, batch_size=args.batch_size
            )
        for r in result["files"]:
            print(f"{r.name}\t{r.bpp:.4f} bpp\tpsnr {r.psnr:.2f}\tms-ssim {r.ms_ssim:.4f}")
        print(
            json.dumps(
                {k: result[k] for k in ("mean_bpp", "mean_psnr", "mean_ms_ssim")}
            )
        )
        return 0

    if args.cmd == "anchors":
        from neural_network_image_compression_tpu.evaluation.anchors import (
            jpeg_rd_curve,
            png_rate,
        )

        qualities = tuple(int(q) for q in args.qualities.split(","))
        for point in jpeg_rd_curve(args.input, qualities) + [png_rate(args.input)]:
            print(json.dumps(point))
        return 0

    if args.cmd == "tb":
        from neural_network_image_compression_tpu.utils.tensorboard import (
            convert_jsonl,
        )

        path = convert_jsonl(
            os.path.join(args.run, "metrics.jsonl"), args.out
        )
        print(f"wrote {path}")
        return 0

    if args.cmd == "build-data":
        if args.url_list:
            from neural_network_image_compression_tpu.data.builder import (
                build_patches_from_urls,
            )

            n = build_patches_from_urls(
                args.url_list, args.output, patch_size=args.patch_size,
                limit=args.limit, workers=args.workers,
            )
        else:
            from neural_network_image_compression_tpu.data.builder import (
                build_patches,
            )

            n = build_patches(
                args.source, args.output, patch_size=args.patch_size,
                limit=args.limit, workers=args.workers,
            )
        print(f"wrote {n} patches to {args.output}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

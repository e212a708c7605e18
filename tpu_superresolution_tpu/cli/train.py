"""Training CLI — flag-compatible spirit of the reference train.py:183-423.

    python -m tpu_superresolution_tpu.cli.train \
        --data_root /path/DeepRockSR-2D --scale X2 --epochs 100 \
        --scheduler Exponential --loss mse --patch_size 100

Extensions over the reference: --model picks any registered family
(default ms_resunet), --dp shards the batch across the device mesh
(shard_map + psum), --workdir for artifacts.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from tpu_superresolution_tpu.cli.common import report_devices, resolve_workers, seed_everything
from tpu_superresolution_tpu.core.config import (
    DataConfig,
    MSResUNetConfig,
    TrainConfig,
    UNet2DConfig,
    build_model,
    model_registry,
)
from tpu_superresolution_tpu.data import Loader, PairedIndex
from tpu_superresolution_tpu.train.engine import (
    Trainer,
    build_optimizer,
    create_train_state,
)


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--scale", type=str, choices=["X2", "X4"], required=True)
    ap.add_argument("--model", type=str, default="ms_resunet",
                    help=f"one of {sorted(model_registry) or '(registered models)'}")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--scheduler", type=str,
                    choices=["OneCycle", "Exponential", "Cosine", "None"], default="None")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--loss", type=str, choices=["mse", "l1", "l1_ssim"], default="mse")
    ap.add_argument("--patch_size", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument("--no_flips", action="store_true")
    # extended aug (lost reference CLI had --do_blur; common_commands.txt:5-6,
    # notebook pipeline cnn.ipynb cell 22)
    ap.add_argument("--do_blur", action="store_true",
                    help="paired gaussian blur aug at p=0.5 (shared sigma per pair)")
    ap.add_argument("--normalize", action="store_true",
                    help="normalize both pair members with dataset HR mean/std "
                         "(one stats pass over the train set; metrics are then "
                         "reported in normalized space, as in the notebook)")
    ap.add_argument("--early_stop_patience", type=int, default=None,
                    help="stop after N epochs without val-loss improvement")
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--time_log_every", type=int, default=0,
                    help="log within-epoch data/step timing every N batches (0=off)")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of params (e.g. 0.999); validation and "
                         "best checkpoints use the EMA weights. 0 = off")
    ap.add_argument("--val_every", type=int, default=1,
                    help="validate every N epochs (always the last; checkpoints/early-stop only see validated epochs)")
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint dir to restore weights (+opt state unless --finetune)")
    ap.add_argument("--finetune", action="store_true")
    ap.add_argument("--freeze_regex", type=str, default=None)
    ap.add_argument("--ft_lr", type=float, default=None)
    ap.add_argument("--workdir", type=str, default=".")
    ap.add_argument("--trace", type=str, default=None,
                    help="write a chrome-trace timeline (Perfetto/chrome://tracing)"
                         " of per-epoch train/val spans to this path"
                         " (tunnel-safe host-side profiling artifact)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel shards over the device mesh (0 = single device)")
    # unet2d sizing (the reference's earlier train.py exposed
    # --base_channels — common_commands.txt:5-6)
    ap.add_argument("--base_channels", type=int, default=64)
    # transformer architecture overrides (swinir/hat/dat; None = family
    # default — the finetune CLI carries the same knobs)
    ap.add_argument("--embed_dim", type=int, default=None)
    ap.add_argument("--t_depths", type=str, default=None,
                    help="comma list, e.g. 6,6,6,6")
    ap.add_argument("--t_heads", type=str, default=None)
    ap.add_argument("--window_size", type=int, default=None)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--residual", action="store_true",
                    help="unet2d residual head: predict a correction to the "
                         "(pre-upscaled) input — starts at the bicubic floor")
    ap.add_argument("--cache_decoded", action="store_true",
                    help="cache decoded images in host RAM (epochs 2+ skip decode)")
    ap.add_argument("--cache_limit_gb", type=float, default=8.0)
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    key = seed_everything(args.seed)
    report_devices()
    t_all = time.time()

    model_name = args.model
    if model_name in ("ms_resunet", "unet2d"):
        tflags = {
            "--embed_dim": args.embed_dim, "--t_depths": args.t_depths,
            "--t_heads": args.t_heads, "--window_size": args.window_size,
        }
        passed = [k for k, v in tflags.items() if v is not None]
        if passed:
            raise SystemExit(
                f"flag(s) {passed} not valid for model '{model_name}' "
                f"(transformer-only overrides)"
            )
    if model_name == "ms_resunet":
        mcfg = MSResUNetConfig(scale=int(args.scale[1:]))
    elif model_name == "unet2d":
        mcfg = UNet2DConfig(
            scale=int(args.scale[1:]),
            base_channels=args.base_channels,
            depth=args.depth,
            residual=args.residual,
        )
    else:
        # importing the model zoo populates the registry (swinir/hat/dat)
        import dataclasses

        from tpu_superresolution_tpu import models as _models  # noqa: F401

        cfg_cls, _ = model_registry[model_name]
        mcfg = cfg_cls(scale=int(args.scale[1:]))
        over = {}
        if args.embed_dim is not None:
            over["embed_dim"] = args.embed_dim
        if args.t_depths is not None:
            over["depths"] = tuple(int(d) for d in args.t_depths.split(","))
        if args.t_heads is not None:
            over["num_heads"] = tuple(int(h) for h in args.t_heads.split(","))
        if args.window_size is not None:
            over["window_size"] = args.window_size
        bad = [k for k in over if not hasattr(mcfg, k)]
        if bad:
            raise SystemExit(
                f"flag(s) {bad} not valid for model '{model_name}' "
                f"(its config has no such field)"
            )
        if over:
            mcfg = dataclasses.replace(mcfg, **over)
    # CNN families use the pre-upscale convention; transformers native-LR
    convention = "native_lr" if mcfg.upsamples_internally else "pre_upscale"
    channels = mcfg.in_channels

    norm_mean = norm_std = None
    if args.normalize:
        from tpu_superresolution_tpu.data.transforms import dataset_mean_std

        stats_loader = Loader(
            PairedIndex(args.data_root, "train", args.scale), 8,
            grayscale=channels == 1, channels=channels,
        )
        norm_mean, norm_std = dataset_mean_std(stats_loader, use_hr=True)
        print(f"[stats] dataset HR mean={norm_mean:.8f} std={norm_std:.8f}")

    dcfg = DataConfig(
        data_root=args.data_root,
        scale=args.scale,
        convention=convention,
        patch_size=args.patch_size if convention == "pre_upscale" else None,
        lr_patch=args.patch_size if convention == "native_lr" else None,
        do_flips=not args.no_flips,
        do_blur=args.do_blur,
        norm_mean=norm_mean,
        norm_std=norm_std,
        grayscale=channels == 1,
        channels=channels,
    )
    tcfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        loss=args.loss,
        lr=args.lr,
        weight_decay=args.weight_decay,
        scheduler=args.scheduler.lower(),
        seed=args.seed,
        freeze_regex=args.freeze_regex,
        finetune=args.finetune,
        ft_lr=args.ft_lr,
        early_stop_patience=args.early_stop_patience,
        time_log_every=args.time_log_every,
        val_every=args.val_every,
        ema_decay=args.ema_decay or None,
        dp_shards=args.dp,
    )

    idx_tr = PairedIndex(args.data_root, "train", args.scale)
    idx_va = PairedIndex(args.data_root, "valid", args.scale)
    workers = resolve_workers(args.workers)
    scale_int = int(args.scale[1:])
    # host-side aligned crops minimize host->device transfer (patches
    # upload instead of full images); the on-device crop then no-ops
    host_crop = (
        args.patch_size
        if convention == "pre_upscale"
        else args.patch_size * scale_int
    )
    train_loader = Loader(
        idx_tr, args.batch_size, shuffle=True, seed=args.seed,
        grayscale=dcfg.grayscale, channels=channels, num_threads=workers,
        host_crop_hr=host_crop, host_crop_scale=scale_int,
        cache_decoded=args.cache_decoded, cache_limit_gb=args.cache_limit_gb,
    )
    valid_loader = Loader(
        idx_va, max(1, args.batch_size // 2),
        grayscale=dcfg.grayscale, channels=channels, num_threads=workers,
    )
    print(f"[cfg] model={model_name} convention={convention} "
          f"train={len(idx_tr)} valid={len(idx_va)} workers={workers}")

    # profile first batches (reference warmup_profile, train.py:79-86)
    t0 = time.time()
    for i, _ in enumerate(train_loader):
        if i == 0:
            print(f"[profile] first batch load: {time.time() - t0:.2f}s")
        if i >= 2:
            break
    print(f"[profile] 3 batches load: {time.time() - t0:.2f}s")

    model = build_model(mcfg)
    sample_lr, sample_hr = next(iter(valid_loader))
    init_x = jnp.zeros((1,) + sample_hr.shape[1:3] + (channels,), jnp.float32) \
        if convention == "pre_upscale" else jnp.zeros((1,) + sample_lr.shape[1:3] + (channels,), jnp.float32)
    variables = model.init(jax.random.key(args.seed), init_x, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if args.resume:
        from tpu_superresolution_tpu.train.checkpoint import load_weights_only

        restored, meta = load_weights_only(args.resume)
        params, batch_stats = restored["params"], restored.get("batch_stats", {})
        print(f"[ckpt] loaded model weights from {args.resume} (epoch {meta.get('epoch')})")

    tx = build_optimizer(tcfg, len(train_loader), params)
    state = create_train_state(model, params, batch_stats, tx,
                               ema_decay=tcfg.ema_decay)

    if args.resume and not args.finetune:
        from tpu_superresolution_tpu.train.checkpoint import load_checkpoint

        state, _ = load_checkpoint(args.resume, target_state=state)
        print("[ckpt] restored optimizer state")

    trainer = Trainer(model, mcfg, dcfg, tcfg, workdir=args.workdir,
                      trace_path=args.trace)
    trainer.fit(state, train_loader, valid_loader, rng_key=key)
    print(f"[ALL][time] total train time={time.time() - t_all:.1f}s")


if __name__ == "__main__":
    main()

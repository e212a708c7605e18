"""SwinIR fine-tuning CLI — capability parity with the reference
finetune_swinir.py:213-374:

    python -m tpu_superresolution_tpu.cli.finetune \
        --data_root /path/DeepRockSR-2D --scale X4 \
        --weights 001_classicalSR_DIV2K_s48w8_SwinIR-M_x4.pth

Builds SwinIR-M (window 8, depths [6]x6, embed 180 — the exact config
the reference uses, finetune_swinir.py:269-281), loads an official torch
checkpoint through interop (handling the 'params' wrapper), optionally
freezes by regex, and trains L1 with epoch-wise cosine annealing.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from tpu_superresolution_tpu.cli.common import report_devices, resolve_workers, seed_everything
from tpu_superresolution_tpu.core.config import DataConfig, SwinIRConfig, TrainConfig, build_model
from tpu_superresolution_tpu.data import Loader, PairedIndex
from tpu_superresolution_tpu.train.engine import Trainer, build_optimizer, create_train_state


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--scale", type=str, choices=["X2", "X4"], required=True)
    ap.add_argument("--weights", type=str, default=None,
                    help="official SwinIR .pth/.pt (torch) OR an Orbax checkpoint dir")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr_patch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--freeze_regex", type=str, default=None)
    ap.add_argument("--scheduler", type=str, choices=["None", "Cosine"], default="Cosine")
    ap.add_argument("--min_lr", type=float, default=2e-6)
    ap.add_argument("--grad_clip", type=float, default=1.0)
    ap.add_argument("--workdir", type=str, default=".")
    ap.add_argument("--trace", type=str, default=None,
                    help="write a chrome-trace timeline (Perfetto/chrome://tracing)"
                         " of per-epoch train/val spans to this path"
                         " (tunnel-safe host-side profiling artifact)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel shards over the device mesh (0 = single device)")
    ap.add_argument("--early_stop_patience", type=int, default=None,
                    help="stop after N epochs without val-loss improvement")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of params (e.g. 0.999); validation and "
                         "best checkpoints use the EMA weights. 0 = off")
    ap.add_argument("--val_every", type=int, default=1,
                    help="validate every N epochs (always the last; checkpoints/early-stop only see validated epochs)")
    # architecture overrides (default = SwinIR-M, the reference's config;
    # smaller values for smoke tests)
    ap.add_argument("--embed_dim", type=int, default=180)
    ap.add_argument("--depths", type=str, default="6,6,6,6,6,6")
    ap.add_argument("--num_heads", type=str, default="6,6,6,6,6,6")
    ap.add_argument("--window_size", type=int, default=8)
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    key = seed_everything(args.seed)
    report_devices()
    scale_int = 2 if args.scale.upper() == "X2" else 4

    depths = tuple(int(d) for d in args.depths.split(","))
    heads = tuple(int(h) for h in args.num_heads.split(","))
    mcfg = SwinIRConfig(
        scale=scale_int, embed_dim=args.embed_dim, depths=depths,
        num_heads=heads, window_size=args.window_size,
    )  # defaults = SwinIR-M
    if args.weights and args.weights.endswith((".pth", ".pt")):
        # Infer the architecture from the checkpoint's tensor shapes so
        # non-default published checkpoints fine-tune without guessing
        # flags (interop.infer_config); explicit flags must agree.
        import dataclasses

        from tpu_superresolution_tpu.interop import infer_config, load_torch_checkpoint

        sd = load_torch_checkpoint(args.weights)
        inferred = infer_config("swinir", sd, scale_int)
        ap = build_argparser()
        flags_at_default = all(
            getattr(args, f) == ap.get_default(f)
            for f in ("embed_dim", "depths", "num_heads", "window_size")
        )
        if flags_at_default:
            mcfg = dataclasses.replace(
                inferred, scale=scale_int,
                drop_path_rate=mcfg.drop_path_rate,
            )
            print(f"[arch] inferred from checkpoint: embed_dim={mcfg.embed_dim} "
                  f"depths={mcfg.depths} heads={mcfg.num_heads} ws={mcfg.window_size} "
                  f"upsampler={mcfg.upsampler}")
        else:
            mismatch = [
                (f, getattr(mcfg, f), getattr(inferred, f))
                for f in ("embed_dim", "depths", "num_heads", "window_size")
                if getattr(mcfg, f) != getattr(inferred, f)
            ]
            if mismatch:
                raise SystemExit(
                    f"architecture flags disagree with the checkpoint: "
                    + ", ".join(f"{f}: flag {a} vs ckpt {b}" for f, a, b in mismatch)
                )
    model = build_model(mcfg)

    dcfg = DataConfig(
        data_root=args.data_root, scale=args.scale, convention="native_lr",
        lr_patch=args.lr_patch, do_flips=False, grayscale=False, channels=3,
    )
    tcfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, loss="l1",
        lr=args.lr, weight_decay=args.weight_decay,
        scheduler=args.scheduler.lower(), min_lr=args.min_lr,
        grad_clip_norm=args.grad_clip, seed=args.seed,
        freeze_regex=args.freeze_regex, finetune=True,
        early_stop_patience=args.early_stop_patience,
        val_every=args.val_every,
        ema_decay=args.ema_decay or None,
        dp_shards=args.dp,
    )

    idx_tr = PairedIndex(args.data_root, "train", args.scale)
    idx_va = PairedIndex(args.data_root, "valid", args.scale)
    workers = resolve_workers(args.workers)
    train_loader = Loader(idx_tr, args.batch_size, shuffle=True, drop_last=True,
                          grayscale=False, channels=3, seed=args.seed, num_threads=workers,
                          host_crop_hr=args.lr_patch * scale_int,
                          host_crop_scale=scale_int)
    valid_loader = Loader(idx_va, max(1, args.batch_size // 2),
                          grayscale=False, channels=3, num_threads=workers)

    init_x = jnp.zeros((1, args.lr_patch, args.lr_patch, 3), jnp.float32)
    variables = model.init(jax.random.key(args.seed), init_x, train=False)
    params, batch_stats = variables["params"], {}

    if args.weights:
        if args.weights.endswith((".pth", ".pt")):
            from tpu_superresolution_tpu.interop import convert_swinir, load_torch_checkpoint

            sd = load_torch_checkpoint(args.weights)
            converted = convert_swinir(sd, scale=scale_int)
            params = converted["params"]
            print(f"[weights] loaded torch checkpoint: {args.weights}")
        else:
            from tpu_superresolution_tpu.train.checkpoint import load_weights_only

            restored, _ = load_weights_only(args.weights)
            params = restored["params"]
            print(f"[weights] loaded orbax checkpoint: {args.weights}")

    tx = build_optimizer(tcfg, len(train_loader), params)
    state = create_train_state(model, params, batch_stats, tx,
                               ema_decay=tcfg.ema_decay)
    if args.freeze_regex:
        from tpu_superresolution_tpu.train.freeze import count_trainable, freeze_mask

        mask = freeze_mask(params, args.freeze_regex)
        print(f"[freeze] regex='{args.freeze_regex}', "
              f"trainable={count_trainable(mask)}/{len(jax.tree.leaves(mask))}")

    t_all = time.time()
    trainer = Trainer(model, mcfg, dcfg, tcfg, workdir=args.workdir,
                      trace_path=args.trace)
    trainer.fit(state, train_loader, valid_loader, rng_key=key)
    print(f"[time] total: {time.time() - t_all:.1f}s")
    print(f"[done] best_val_loss={trainer.best_val_loss:.6f}, "
          f"best_val_psnr={trainer.best_val_psnr:.2f} dB")


if __name__ == "__main__":
    main()

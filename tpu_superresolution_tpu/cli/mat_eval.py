"""Direct .mat volume evaluation CLI — capability parity with the
reference's lost mat_eval_mrccm.py (CLI documented in
common_commands.txt:1-3):

    python -m tpu_superresolution_tpu.cli.mat_eval \
        --hr_mat ILS1.mat --lr_mat ILS_LR.mat --ckpt best_X4 \
        --batch_size 4 --limit_pairs 5

Slices both volumes, runs the checkpointed model slice-wise, and reports
PSNR/SSIM plus the bicubic floor.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hr_mat", type=str, required=True)
    ap.add_argument("--lr_mat", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--limit_pairs", type=int, default=None)
    ap.add_argument("--scale", type=str, default="X4")
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--tile_overlap", type=int, default=16)
    return ap


def _batches(lr, hr, bs):
    for i in range(0, lr.shape[0], bs):
        yield lr[i : i + bs], hr[i : i + bs]


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from tpu_superresolution_tpu.cli.common import report_devices
    from tpu_superresolution_tpu.core.config import EvalConfig, MSResUNetConfig, build_model
    from tpu_superresolution_tpu.data.mrccm import mat_volume_pairs
    from tpu_superresolution_tpu.evaluate.baseline import bicubic_baseline
    from tpu_superresolution_tpu.evaluate.runner import Evaluator
    from tpu_superresolution_tpu.train.checkpoint import (
        load_weights_only,
        model_config_from_checkpoint,
    )

    report_devices()
    scale_int = int(args.scale[1:])
    lr, hr = mat_volume_pairs(args.lr_mat, args.hr_mat, args.limit_pairs)
    print(f"[data] pairs: {lr.shape[0]} | lr {lr.shape[1:3]} hr {hr.shape[1:3]}")

    mcfg = model_config_from_checkpoint(args.ckpt) or MSResUNetConfig(scale=scale_int)
    model = build_model(mcfg)
    restored, meta = load_weights_only(args.ckpt)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    print(f"[ckpt] {args.ckpt}: model={mcfg.name} epoch={meta.get('epoch')}")

    convention = "native_lr" if mcfg.upsamples_internally else "pre_upscale"
    base = bicubic_baseline(_batches(lr, hr, args.batch_size), scale_int)
    print(f"[baseline] Bicubic PSNR: {base['psnr']:.2f} dB | SSIM: {base['ssim']:.4f}")

    ecfg = EvalConfig(
        batch_size=args.batch_size,
        tile_size=args.tile or None,
        tile_overlap=args.tile_overlap,
    )
    ev = Evaluator(model, variables, scale_int, convention, ecfg)
    results = ev.run(_batches(lr, hr, args.batch_size))
    print(f"[result] PSNR {results['psnr']:.2f} dB | SSIM {results['ssim']:.4f}")
    return results


if __name__ == "__main__":
    main()

"""Pairwise model comparison reports — rebuilds the capability of the
reference's lost ``report_creator.ipynb`` (``.MISSING_LARGE_BLOBS:1-13``
lists 12 ``report/*.png`` side-by-side comparisons such as
``dat_vs_swinir_x4_3607.png``).

    python -m tpu_superresolution_tpu.cli.compare \
        --data_root /path/DeepRockSR-2D --scale X4 \
        --ckpt_a swinir.pth --model_a swinir \
        --ckpt_b best_X4 --indices 3,7 --out_dir report

For each selected test image, writes ``{a}_vs_{b}_x{s}_{stem}.png`` —
a labeled side-by-side panel [bicubic | A | B | HR] — and prints
per-model PSNR/SSIM for the selection.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.cli.common import report_devices
from tpu_superresolution_tpu.cli.evaluate import load_any_checkpoint
from tpu_superresolution_tpu.data import PairedIndex
from tpu_superresolution_tpu.data.decode import decode_image


def _panel(images, labels, pad=8):
    """Horizontally concatenate [H, W, C] float panels with labels
    rendered into a header strip (PIL default font; no extra deps)."""
    from PIL import Image, ImageDraw

    h = max(im.shape[0] for im in images)
    strips = []
    for im in images:
        arr = (np.clip(im, 0, 1) * 255 + 0.5).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        if arr.shape[0] < h:  # upscale LR panels to HR size (nearest)
            r = h // arr.shape[0]
            arr = np.repeat(np.repeat(arr, r, 0), r, 1)
        strips.append(arr)
    w = sum(s.shape[1] for s in strips) + pad * (len(strips) - 1)
    header = 16
    canvas = np.full((h + header, w, 3), 255, np.uint8)
    x0 = 0
    img = Image.fromarray(canvas)
    draw = ImageDraw.Draw(img)
    for s, lab in zip(strips, labels):
        img.paste(Image.fromarray(s), (x0, header))
        draw.text((x0 + 2, 2), lab, fill=(0, 0, 0))
        x0 += s.shape[1] + pad
    return img


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--scale", type=str, choices=["X2", "X4"], required=True)
    ap.add_argument("--ckpt_a", type=str, required=True)
    ap.add_argument("--ckpt_b", type=str, required=True)
    ap.add_argument("--model_a", type=str, default="ms_resunet",
                    help="architecture for torch checkpoints (Orbax dirs "
                         "carry their config)")
    ap.add_argument("--model_b", type=str, default="ms_resunet")
    ap.add_argument("--name_a", type=str, default=None, help="panel label")
    ap.add_argument("--name_b", type=str, default=None)
    ap.add_argument("--indices", type=str, default="0",
                    help="comma-separated test-split indices")
    ap.add_argument("--out_dir", type=str, default="report")
    return ap


def main(argv=None):
    from pathlib import Path

    from tpu_superresolution_tpu.data.transforms import pre_upscale_batch
    from tpu_superresolution_tpu.ops.metrics import psnr, ssim

    args = build_argparser().parse_args(argv)
    report_devices()
    scale_int = int(args.scale[1:])
    idx = PairedIndex(args.data_root, "test", args.scale)
    indices = [int(s) for s in args.indices.split(",") if s.strip()]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    sides = []
    for tag, ckpt, mname in (("a", args.ckpt_a, args.model_a),
                             ("b", args.ckpt_b, args.model_b)):
        mcfg, model, variables = load_any_checkpoint(ckpt, mname, scale_int)
        label = {"a": args.name_a, "b": args.name_b}[tag] or mcfg.name
        fn = jax.jit(lambda lr, m=model, v=variables: m.apply(v, lr, train=False))
        sides.append((label, mcfg, fn))
        print(f"[ckpt] {tag}: {ckpt} -> {mcfg.name} ({label})")

    stats = {s[0]: {"psnr": [], "ssim": []} for s in sides}
    for i in indices:
        lr_path, hr_path = idx.pairs[i]
        ch = sides[0][1].in_channels
        lr = decode_image(lr_path, grayscale=ch == 1, channels=ch)[None]
        hr = decode_image(hr_path, grayscale=ch == 1, channels=ch)[None]
        bic = np.asarray(pre_upscale_batch(jnp.asarray(lr), scale_int))
        panels, labels = [lr[0], bic[0]], ["LR", "bicubic"]
        for label, mcfg, fn in sides:
            inp = jnp.asarray(bic if not mcfg.upsamples_internally else lr)
            ch_m = mcfg.in_channels
            if inp.shape[-1] != ch_m:
                inp = jnp.repeat(inp, ch_m, axis=-1)
            sr = np.asarray(fn(inp).astype(jnp.float32))
            if sr.shape[-1] != hr.shape[-1]:
                sr = sr.mean(axis=-1, keepdims=True)
            panels.append(sr[0])
            labels.append(label)
            p = float(psnr(jnp.asarray(sr), jnp.asarray(hr)))
            s = float(ssim(jnp.asarray(sr), jnp.asarray(hr)))
            stats[label]["psnr"].append(p)
            stats[label]["ssim"].append(s)
        panels.append(hr[0])
        labels.append("HR")
        stem = Path(hr_path).stem
        name = f"{sides[0][0]}_vs_{sides[1][0]}_x{scale_int}_{stem}.png"
        _panel(panels, labels).save(out_dir / name)
        print(f"[save] {out_dir / name}")

    for label, d in stats.items():
        print(f"[result] {label}: PSNR {np.mean(d['psnr']):.2f} dB | "
              f"SSIM {np.mean(d['ssim']):.4f} (n={len(d['psnr'])})")


if __name__ == "__main__":
    main()

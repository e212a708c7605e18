"""EMA + self-ensemble measurement: train ONE SwinIR-lite on the grains
set with --ema_decay 0.999, then evaluate the best checkpoint four ways
(raw / EMA weights x plain / x8 self-ensemble) against the bicubic
floor.  Quantifies both round-4 additions in dB on the same run the
X2 grains table uses (SwinIR-lite 2000 ep -> 34.28 dB without EMA).

The reference has neither feature (plain torch loops, no TTA —
modules/train.py, modules/evaluate.py); EMA follows BasicSR-style
ema_decay=0.999 practice, self-ensemble the classic EDSR "+" protocol.

Run on the TPU: python experiments/ema_tta_ab.py [epochs] [val_every]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 25
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000


def main():
    from util_fakedata import make_deeprock_dataset

    from tpu_superresolution_tpu.cli.evaluate import main as evaluate_main
    from tpu_superresolution_tpu.cli.finetune import main as finetune_main

    tmp = tempfile.mkdtemp(prefix="ema_tta_")
    root = make_deeprock_dataset(
        tmp, n_per_split=48, hr_size=96, scale="X2", seed=7, style="grains",
    )
    workdir = os.path.join(tmp, "run")
    os.makedirs(workdir, exist_ok=True)
    print("[ema_tta] dataset:", root, flush=True)

    finetune_main([
        "--data_root", str(root), "--scale", "X2",
        "--epochs", str(EPOCHS), "--batch_size", "8", "--lr_patch", "32",
        "--lr", "2e-4", "--min_lr", "1e-5", "--ema_decay", "0.999",
        "--embed_dim", "60", "--depths", "4,4,4,4", "--num_heads", "6,6,6,6",
        "--window_size", "8", "--workdir", workdir,
        "--val_every", str(VAL_EVERY),
    ])

    ckpt = os.path.join(workdir, "bestpsnr_X2")
    assert os.path.isdir(ckpt), os.listdir(workdir)
    table = {}
    for tag, flags in [
        ("raw", []),
        ("raw+tta", ["--self_ensemble"]),
        ("ema", ["--ema"]),
        ("ema+tta", ["--ema", "--self_ensemble"]),
    ]:
        res = evaluate_main([
            "--scale", "X2", "--data_root", str(root), "--ckpt", ckpt,
            "--batch_size", "4", "--no_baseline", *flags,
        ])
        table[tag] = (res["psnr"], res["ssim"])
        print(f"[ema_tta] {tag:8s}: PSNR {res['psnr']:.2f} dB "
              f"SSIM {res['ssim']:.4f}", flush=True)
    print("[ema_tta] TABLE", table, flush=True)
    print("RC=0")


if __name__ == "__main__":
    main()

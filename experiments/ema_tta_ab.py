"""EMA + self-ensemble measurement (phase 13 / VERDICT r4 next-step
#2): train ONE SwinIR-lite on the grains set with --ema_decay 0.999,
then evaluate the best checkpoint four ways (raw / EMA weights x plain
/ x8 self-ensemble) against the bicubic floor.  Quantifies both
round-4 additions in dB on the same recipe the X2 grains table used
(SwinIR-lite 2000 ep -> 34.28 dB without EMA).

The reference has neither feature (plain torch loops, no TTA —
modules/train.py, modules/evaluate.py); EMA follows BasicSR-style
ema_decay=0.999 practice, self-ensemble the classic EDSR "+" protocol.

Round-5 hardening: train and each eval run as fresh subprocesses
(proof harness lesson — VERDICT r4 weak #2); checkpoints persist under
experiments/ckpts/ema_tta_grains_x2/.  NOTE: evaluate's --ema is now
tri-state and DEFAULTS TO EMA when meta records ema_decay, so the raw
cells pass --no-ema explicitly.

Run on the TPU: python experiments/ema_tta_ab.py [epochs] [val_every]
Re-eval only (skip training): PROOF_EVAL_ONLY=1 python ...
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 25
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000


def _run_cli(module, argv):
    cmd = [sys.executable, "-u", "-m", module] + [str(a) for a in argv]
    print("[ema_tta] exec:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd, cwd=REPO)
    if rc != 0:
        raise RuntimeError(f"{module} exited rc={rc}")


def main():
    from util_fakedata import make_deeprock_dataset

    rundir = os.path.join(REPO, "experiments", "ckpts", "ema_tta_grains_x2")
    dataroot = os.path.join(rundir, "data")
    if os.path.isdir(os.path.join(dataroot, "DeepRockSR-2D")):
        root = os.path.join(dataroot, "DeepRockSR-2D")
    else:
        root = make_deeprock_dataset(
            dataroot, n_per_split=48, hr_size=96, scale="X2", seed=7,
            style="grains",
        )
    workdir = os.path.join(rundir, "run")
    os.makedirs(workdir, exist_ok=True)
    print("[ema_tta] dataset:", root, flush=True)

    ckpt = os.path.join(workdir, "bestpsnr_X2")
    if not (os.environ.get("PROOF_EVAL_ONLY") == "1" and os.path.isdir(ckpt)):
        _run_cli("tpu_superresolution_tpu.cli.finetune", [
            "--data_root", str(root), "--scale", "X2",
            "--epochs", str(EPOCHS), "--batch_size", "8", "--lr_patch", "32",
            "--lr", "2e-4", "--min_lr", "1e-5", "--ema_decay", "0.999",
            "--embed_dim", "60", "--depths", "4,4,4,4",
            "--num_heads", "6,6,6,6",
            "--window_size", "8", "--workdir", workdir,
            "--val_every", str(VAL_EVERY),
        ])
    assert os.path.isdir(ckpt), os.listdir(workdir)
    table = {}
    for tag, flags in [
        ("raw", ["--no-ema"]),
        ("raw+tta", ["--no-ema", "--self_ensemble"]),
        ("ema", ["--ema"]),
        ("ema+tta", ["--ema", "--self_ensemble"]),
    ]:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            report = tf.name
        _run_cli("tpu_superresolution_tpu.cli.evaluate", [
            "--scale", "X2", "--data_root", str(root), "--ckpt", ckpt,
            "--batch_size", "4", "--no_baseline", "--report_json", report,
            *flags,
        ])
        with open(report) as f:
            res = json.load(f)
        os.unlink(report)
        table[tag] = (res["psnr"], res["ssim"])
        print(f"[ema_tta] {tag:8s}: PSNR {res['psnr']:.2f} dB "
              f"SSIM {res['ssim']:.4f}", flush=True)
    print("[ema_tta] TABLE", table, flush=True)
    print("RC=0")


if __name__ == "__main__":
    main()

"""X4 grains table, +TTA column: re-evaluate every persisted X4 proof
checkpoint with --self_ensemble (x8 dihedral TTA, EDSR "+" protocol —
reference analog: the ensemble trick the SR literature applies on top
of finetune_swinir.py:213-374-style training; measured +1.06 dB on the
X2 recipe, DECISIONS.md round-5).  Eval-only: no training, each eval a
fresh subprocess so exactly one process holds the TPU.

Checkpoint dirs: round-4 phase-12 /tmp survivors copied to
experiments/ckpts/<fam>_proof_grains_x4_r4 (old layout: shuffled2D at
the dir root), plus the round-5 harness layout (<dir>/data +
<dir>/run).  SwinIR appears twice: the banked 2000-ep ckpt and the
phase-6 4000-ep long run (budget-limit probe, VERDICT r4 weak #3).
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CK = os.path.join(REPO, "experiments", "ckpts")

JOBS = [
    ("msresunet", f"{CK}/msresunet_proof_grains_x4_r4"),
    ("unet2d", f"{CK}/unet2d_proof_grains_x4"),
    ("swinir-2000", f"{CK}/swinir2000_proof_grains_x4_r4"),
    ("swinir-4000", f"{CK}/swinir_proof_grains_x4"),
    ("dat", f"{CK}/dat_proof_grains_x4_r4"),
    ("hat", f"{CK}/hat_proof_grains_x4_r4"),
]


def find_layout(d):
    """Return (data_root, ckpt) for either proof-dir layout."""
    root = d if os.path.isdir(os.path.join(d, "shuffled2D")) else \
        os.path.join(d, "data")
    run = os.path.join(d, "run")
    for cand in ("bestpsnr_X4", "best_X4"):
        p = os.path.join(run, cand)
        if os.path.isdir(p):
            return root, p
    return root, None


# Recovery pre-step: if the phase-6 long run lost its final eval to a
# backend stall/timeout, produce the PLAIN (non-TTA) 4000-ep number
# from the saved best checkpoint (eval-only, reuses the ckpt + data).
longlog = os.path.join(REPO, "experiments", "logs",
                       "swinir_grains_x4_long.log")
try:
    with open(longlog) as f:
        have_final = "FINAL test PSNR" in f.read()
except OSError:
    have_final = False
if not have_final:
    print("[tta_x4] phase-6 final eval missing — recovering plain "
          "4000-ep number via PROOF_EVAL_ONLY", flush=True)
    env = dict(os.environ, PROOF_EVAL_ONLY="1", PROOF_STYLE="grains",
               PROOF_SCALE="X4")
    rc = subprocess.call(
        [sys.executable, "-u", "experiments/swinir_quality_proof.py"],
        cwd=REPO, env=env)
    print(f"[tta_x4] recovery eval rc={rc}", flush=True)

results = {}
for name, d in JOBS:
    root, ckpt = find_layout(d)
    if ckpt is None or not os.path.isdir(os.path.join(root, "shuffled2D")):
        print(f"[tta_x4] {name}: SKIP (missing ckpt/data under {d})",
              flush=True)
        continue
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        report = tf.name
    cmd = [sys.executable, "-u", "-m", "tpu_superresolution_tpu.cli.evaluate",
           "--scale", "X4", "--data_root", root, "--ckpt", ckpt,
           "--batch_size", "4", "--no_baseline", "--self_ensemble",
           "--report_json", report]
    print("[tta_x4] exec:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd, cwd=REPO)
    if rc != 0:
        print(f"[tta_x4] {name}: FAIL rc={rc}", flush=True)
        continue
    with open(report) as f:
        res = json.load(f)
    os.unlink(report)
    results[name] = res
    print(f"[tta_x4] {name}: PSNR {res['psnr']:.2f} dB "
          f"SSIM {res['ssim']:.4f} (x8 TTA)", flush=True)

print("[tta_x4] summary:", json.dumps(
    {k: round(v["psnr"], 2) for k, v in results.items()}), flush=True)
print("ALL DONE", flush=True)

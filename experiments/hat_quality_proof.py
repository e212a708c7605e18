"""HAT end-to-end quality proof: train a HAT-lite from scratch on the
synthetic DeepRock-layout set through the train CLI, then show
test-split PSNR beats the bicubic floor via the evaluate CLI.  Extends
the SwinIR proof (experiments/swinir_quality_proof.py, +8.9 dB) to the
second transformer family; production defaults (fused megakernel path,
fused reconstruction, drop_path 0.1) are exercised end to end.

Run on the TPU: python experiments/hat_quality_proof.py [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import tempfile

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def main():
    from util_fakedata import make_deeprock_dataset

    tmp = tempfile.mkdtemp(prefix="hat_proof_")
    root = make_deeprock_dataset(
        tmp, n_per_split=48, hr_size=96, scale="X2", seed=7
    )
    print("[proof] dataset:", root, flush=True)
    workdir = os.path.join(tmp, "run")
    os.makedirs(workdir, exist_ok=True)

    from tpu_superresolution_tpu.cli.train import main as train_main

    train_main([
        "--data_root", str(root), "--scale", "X2", "--model", "hat",
        "--epochs", str(EPOCHS), "--batch_size", "8", "--patch_size", "32",
        "--lr", "2e-4", "--scheduler", "Cosine",
        "--embed_dim", "60", "--t_depths", "4,4,4,4",
        "--t_heads", "6,6,6,6", "--window_size", "8",
        "--workdir", workdir,
    ])

    from tpu_superresolution_tpu.cli.evaluate import main as evaluate_main

    ckpt = None
    for cand in ("bestpsnr_X2", "best_X2"):
        p = os.path.join(workdir, cand)
        if os.path.isdir(p):
            ckpt = p
            break
    assert ckpt, os.listdir(workdir)
    print("[proof] evaluating", ckpt, flush=True)
    res = evaluate_main([
        "--scale", "X2", "--data_root", str(root), "--ckpt", ckpt,
        "--batch_size", "4",
    ])
    print(f"[proof] FINAL test PSNR {res['psnr']:.2f} dB SSIM {res['ssim']:.4f}",
          flush=True)


if __name__ == "__main__":
    main()

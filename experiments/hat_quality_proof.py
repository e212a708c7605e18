"""HAT end-to-end quality proof: train a HAT-lite from scratch on the
synthetic DeepRock-layout set through the train CLI, then show
test-split PSNR beats the bicubic floor via the evaluate CLI.  Extends
the SwinIR proof (experiments/swinir_quality_proof.py, +8.9 dB) to the
second transformer family; production defaults (fused megakernel path,
fused reconstruction, drop_path 0.1) are exercised end to end.

Run on the TPU: python experiments/hat_quality_proof.py [epochs]
"""

import sys

from proof_common import run_proof

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 1
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def main():
    run_proof("hat_proof_", "tpu_superresolution_tpu.cli.train", lambda root, workdir, scale: [
        "--data_root", root, "--scale", scale, "--model", "hat",
        "--epochs", str(EPOCHS), "--batch_size", "8", "--patch_size", "32",
        "--lr", "2e-4", "--scheduler", "Cosine",
        "--embed_dim", "60", "--t_depths", "4,4,4,4",
        "--t_heads", "6,6,6,6", "--window_size", "8",
        "--workdir", workdir,
        "--val_every", str(VAL_EVERY),
    ])


if __name__ == "__main__":
    main()

"""DAT end-to-end quality proof: train a DAT-lite from scratch on the
synthetic DeepRock-layout set through the train CLI, then show
test-split PSNR beats the bicubic floor via the evaluate CLI.  Extends
the SwinIR (+8.9 dB) and HAT proofs to the third transformer family;
production defaults (dual rect-window attention, AIM, SGFN, fused
reconstruction) are exercised end to end.

Run on the TPU: python experiments/dat_quality_proof.py [epochs]
"""

import sys

from proof_common import run_proof

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 1
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def main():
    run_proof("dat_proof_", "tpu_superresolution_tpu.cli.train", lambda root, workdir, scale: [
        "--data_root", root, "--scale", scale, "--model", "dat",
        "--epochs", str(EPOCHS), "--batch_size", "8", "--patch_size", "32",
        "--lr", "2e-4", "--scheduler", "Cosine",
        "--embed_dim", "60", "--t_depths", "2,2,2,2",
        "--t_heads", "6,6,6,6",
        "--workdir", workdir,
        "--val_every", str(VAL_EVERY),
    ])


if __name__ == "__main__":
    main()

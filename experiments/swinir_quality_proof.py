"""Transformer end-to-end quality proof (VERDICT r2 item 6): train a
SwinIR-lite from scratch on the synthetic DeepRock-layout set through
the finetune CLI, then show test-split PSNR beats the bicubic floor via
the evaluate CLI.  (The UNet2D proof exists — +10.4 dB over floor; this
closes the transformer gap.  DeepRockSR-2D itself is not present in the
environment.)  Measured on v5e: 42.67 dB vs the 33.74 dB bicubic floor
(PARITY.md round 3).

Run on the TPU: python experiments/swinir_quality_proof.py [epochs]
"""

import sys

from proof_common import run_proof

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 1
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 300


def main():
    run_proof("swinir_proof_", "tpu_superresolution_tpu.cli.finetune", lambda root, workdir, scale: [
        "--data_root", root, "--scale", scale,
        "--epochs", str(EPOCHS), "--batch_size", "8", "--lr_patch", "32",
        "--lr", "2e-4", "--min_lr", "1e-5",
        "--embed_dim", "60", "--depths", "4,4,4,4", "--num_heads", "6,6,6,6",
        "--window_size", "8", "--workdir", workdir,
        "--val_every", str(VAL_EVERY),
    ])


if __name__ == "__main__":
    main()

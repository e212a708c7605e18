"""MS_ResUNet end-to-end quality proof: train the reference's flagship
CNN (ms_resunet.py; 24.9M params, BASELINE.md anchors 38.00 dB X2 on
DeepRockSR-2D) from scratch on the synthetic DeepRock-layout set
through the train CLI, then show test-split PSNR beats the bicubic
floor via the evaluate CLI.  PROOF_STYLE=grains uses the sharp-edged
ellipse fields (discriminative floor; the transformers' grains rows:
SwinIR 34.28 / HAT 32.44 dB vs 28.80 bicubic).

Run on the TPU: python experiments/msresunet_quality_proof.py [epochs] [val_every]
"""

import sys

from proof_common import run_proof

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 10
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 600


def main():
    run_proof("msresunet_proof_", "tpu_superresolution_tpu.cli.train", lambda root, workdir, scale: [
        "--data_root", root, "--scale", scale,
        "--model", "ms_resunet", "--loss", "mse",
        "--epochs", str(EPOCHS), "--batch_size", "8", "--patch_size", "48",
        "--lr", "1e-4", "--scheduler", "Cosine",
        "--workdir", workdir, "--val_every", str(VAL_EVERY),
    ])


if __name__ == "__main__":
    main()

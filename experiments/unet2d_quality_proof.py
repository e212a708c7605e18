"""UNet2D end-to-end quality proof on the grains set (the smooth-set
proof measured +10.4 dB over its near-oracle floor in round 2; this
adds the discriminative-floor row next to MS_ResUNet/SwinIR/HAT/DAT).
Residual head: the model starts at the bicubic floor and learns a
correction — the reference UNet2D's documented configuration
(SURVEY.md §2.2).

Run on the TPU: python experiments/unet2d_quality_proof.py [epochs] [val_every]
"""

import sys

from proof_common import run_proof

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 25
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000


def main():
    run_proof("unet2d_proof_", "tpu_superresolution_tpu.cli.train", lambda root, workdir, scale: [
        "--data_root", root, "--scale", scale,
        "--model", "unet2d", "--base_channels", "32", "--depth", "3",
        "--residual", "--loss", "mse",
        "--epochs", str(EPOCHS), "--batch_size", "8", "--patch_size", "48",
        "--lr", "2e-4", "--scheduler", "Cosine",
        "--workdir", workdir, "--val_every", str(VAL_EVERY),
    ])


if __name__ == "__main__":
    main()

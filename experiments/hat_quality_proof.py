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

from proof_common import run_proof

VAL_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 1
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
# PROOF_MODEL=hat_fast routes the run through the framework-native
# ws=8 production preset by NAME (HATFastConfig) — the lite geometry
# already used ws=8 via the explicit override, so quality is expected
# identical; this proves the preset end to end through the CLIs.
MODEL = os.environ.get("PROOF_MODEL", "hat")


def main():
    run_proof(f"{MODEL}_proof_", "tpu_superresolution_tpu.cli.train", lambda root, workdir, scale: [
        "--data_root", root, "--scale", scale, "--model", MODEL,
        "--epochs", str(EPOCHS), "--batch_size", "8", "--patch_size", "32",
        "--lr", "2e-4", "--scheduler", "Cosine",
        "--embed_dim", "60", "--t_depths", "4,4,4,4",
        "--t_heads", "6,6,6,6",
        "--workdir", workdir,
        "--val_every", str(VAL_EVERY),
    ] + ([] if MODEL == "hat_fast" else ["--window_size", "8"]))


if __name__ == "__main__":
    main()

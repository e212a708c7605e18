"""Shared scaffold for the from-scratch quality proofs (SwinIR / HAT /
DAT): synthetic DeepRock-layout dataset -> train/finetune CLI ->
best-checkpoint discovery -> evaluate CLI vs the bicubic floor."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_proof(prefix, cli_main, build_args, scale=None):
    """build_args(root, workdir, scale) -> argv for cli_main.  Returns
    the evaluate CLI's result dict.  PROOF_STYLE=grains switches the
    synthetic data to the sharp-edged ellipse fields (lower bicubic
    floor — discriminative between architectures); default stays the
    round-3 smooth set so recorded numbers remain comparable.
    PROOF_SCALE=X4 mirrors BASELINE.md's X2/X4 anchor pair; HR images
    grow to 192^2 there so native-LR patch sizes (LR 48^2) still fit."""
    from util_fakedata import make_deeprock_dataset

    style = os.environ.get("PROOF_STYLE", "smooth")
    scale = scale or os.environ.get("PROOF_SCALE", "X2")
    hr_size = int(os.environ.get("PROOF_HR", "96" if scale == "X2" else "192"))
    tmp = tempfile.mkdtemp(prefix=prefix)
    root = make_deeprock_dataset(
        tmp, n_per_split=48, hr_size=hr_size, scale=scale, seed=7, style=style,
    )
    print("[proof] style:", style, "scale:", scale, "hr:", hr_size, flush=True)
    print("[proof] dataset:", root, flush=True)
    workdir = os.path.join(tmp, "run")
    os.makedirs(workdir, exist_ok=True)

    cli_main(build_args(str(root), workdir, scale))

    from tpu_superresolution_tpu.cli.evaluate import main as evaluate_main

    ckpt = None
    for cand in (f"bestpsnr_{scale}", f"best_{scale}"):
        p = os.path.join(workdir, cand)
        if os.path.isdir(p):
            ckpt = p
            break
    assert ckpt, os.listdir(workdir)
    print("[proof] evaluating", ckpt, flush=True)
    res = evaluate_main([
        "--scale", scale, "--data_root", str(root), "--ckpt", ckpt,
        "--batch_size", "4",
    ])
    print(f"[proof] FINAL test PSNR {res['psnr']:.2f} dB "
          f"SSIM {res['ssim']:.4f}", flush=True)
    return res

"""Shared scaffold for the from-scratch quality proofs (SwinIR / HAT /
DAT): synthetic DeepRock-layout dataset -> train/finetune CLI ->
best-checkpoint discovery -> evaluate CLI vs the bicubic floor."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_proof(prefix, cli_main, build_args, scale="X2"):
    """build_args(root, workdir) -> argv for cli_main.  Returns the
    evaluate CLI's result dict.  PROOF_STYLE=grains switches the
    synthetic data to the sharp-edged ellipse fields (lower bicubic
    floor — discriminative between architectures); default stays the
    round-3 smooth set so recorded numbers remain comparable."""
    from util_fakedata import make_deeprock_dataset

    style = os.environ.get("PROOF_STYLE", "smooth")
    tmp = tempfile.mkdtemp(prefix=prefix)
    root = make_deeprock_dataset(
        tmp, n_per_split=48, hr_size=96, scale=scale, seed=7, style=style,
    )
    print("[proof] style:", style, flush=True)
    print("[proof] dataset:", root, flush=True)
    workdir = os.path.join(tmp, "run")
    os.makedirs(workdir, exist_ok=True)

    cli_main(build_args(str(root), workdir))

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

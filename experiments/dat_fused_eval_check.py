"""Quality guard for the fused DATB kernels: evaluate the SAME saved
DAT checkpoint through the module chain and through the fused
tail(+rect) kernels — test PSNR must agree to ~0.01 dB before the
kernels can become inference defaults.  Uses the persisted X4 grains
checkpoint (28.82 dB, dat_grains_x4.log).  In-process on purpose: the
kernel flags are module globals."""
import sys, os
sys.path.insert(0, "/root/repo")
import jax
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
from tpu_superresolution_tpu.cli.evaluate import main as evaluate_main

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dat_proof_727r4y6b/run/bestpsnr_X4"
ROOT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dat_proof_727r4y6b"

for tag, tail, rect in (
    ("module", "off", "off"),
    ("tail", "on", "off"),
    ("tail+rect", "on", "on"),
):
    ft.FUSED_TAIL = tail
    fr.FUSED_RECT = rect
    try:
        res = evaluate_main([
            "--scale", "X4", "--data_root", ROOT, "--ckpt", CKPT,
            "--batch_size", "4", "--no_baseline",
        ])
        print(f"[fused_eval] {tag:10s}: PSNR {res['psnr']:.4f} dB "
              f"SSIM {res['ssim']:.5f} | {res['mpix_per_s']:.2f} MPix/s",
              flush=True)
    except Exception as e:
        print(f"[fused_eval] {tag:10s}: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
ft.FUSED_TAIL = "off"
fr.FUSED_RECT = "off"
print("ALL DONE", flush=True)

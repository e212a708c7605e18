"""Quality guard for the fused DATB kernels: evaluate the SAME saved
DAT checkpoint through the module chain and through each fused-kernel
stack — test PSNR must agree to ~0.01 dB before the kernels can
become inference defaults.  Uses the persisted X4 grains checkpoint
under experiments/ckpts/ (train one with
PROOF_STYLE=grains PROOF_SCALE=X4 experiments/dat_quality_proof.py).
In-process on purpose: the kernel flags are module globals."""
import sys, os
sys.path.insert(0, "/root/repo")
import jax
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
import tpu_superresolution_tpu.ops.pallas.fused_channel_attn as fc
import tpu_superresolution_tpu.models.dat as datmod
from tpu_superresolution_tpu.cli.evaluate import main as evaluate_main

BASE = "/root/repo/experiments/ckpts/dat_proof_grains_x4"
CKPT = sys.argv[1] if len(sys.argv) > 1 else f"{BASE}/run/bestpsnr_X4"
ROOT = sys.argv[2] if len(sys.argv) > 2 else f"{BASE}/data"

for tag, chan_impl, chan, rect, rect_sh, tail in (
    ("module", "heads", "off", "off", "off", "off"),
    ("blockdiag", "blockdiag", "off", "off", "off", "off"),
    ("chan", "heads", "on", "off", "off", "off"),
    ("chan+rect", "heads", "on", "on", "off", "off"),
    ("chan+rect+shift", "heads", "on", "on", "on", "off"),
    ("all+tail", "heads", "on", "on", "on", "on"),
    ("blockdiag+rect+sh+tail", "blockdiag", "off", "on", "on", "on"),
):
    datmod.CHAN_ATTN_IMPL = chan_impl
    fc.FUSED_CHAN = chan
    fr.FUSED_RECT = rect
    fr.FUSED_RECT_SHIFTED = rect_sh
    ft.FUSED_TAIL = tail
    try:
        res = evaluate_main([
            "--scale", "X4", "--data_root", ROOT, "--ckpt", CKPT,
            "--batch_size", "4", "--no_baseline",
        ])
        print(f"[fused_eval] {tag:16s}: PSNR {res['psnr']:.4f} dB "
              f"SSIM {res['ssim']:.5f} | {res['mpix_per_s']:.2f} MPix/s",
              flush=True)
    except Exception as e:
        print(f"[fused_eval] {tag:16s}: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
ft.FUSED_TAIL = "off"
fr.FUSED_RECT = "off"
fr.FUSED_RECT_SHIFTED = "off"
fc.FUSED_CHAN = "off"
datmod.CHAN_ATTN_IMPL = "heads"
print("ALL DONE", flush=True)

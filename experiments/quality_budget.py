"""Production-default quality budget, measured in dB (VERDICT r2 item 3).

Question: what do the production approximations cost end-to-end through
the TILED evaluate path?  Axes:
  - fused_reconstruct True/False (ops/fused_upsample.py border ring)
  - gelu tanh/erf
  - tiled 64/8 vs untiled
against an exact-chain fp32 untiled reference of the SAME converted
torch-init SwinIR-M weights (the round-2 parity vehicle: no published
.pt exists in this environment).

PSNR is computed over the FULL image (including the unblended outer
border) and over the interior (excluding a 3*scale-px outer ring), so
the border cost is visible separately.

Run: python experiments/quality_budget.py  (holds the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from util_torchref import import_reference

    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
    from tpu_superresolution_tpu.evaluate.tiling import tiled_forward
    from tpu_superresolution_tpu.interop import convert_swinir, extract_state_dict

    print("devices:", jax.devices(), flush=True)
    scale = 4
    ref = import_reference("network_swinir")
    torch.manual_seed(0)
    tmodel = ref.SwinIR(
        img_size=64, patch_size=1, in_chans=3, embed_dim=180,
        depths=[6] * 6, num_heads=[6] * 6, window_size=8, mlp_ratio=2.0,
        upscale=scale, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv", drop_path_rate=0.0,
    )
    variables = convert_swinir(extract_state_dict(tmodel.state_dict()), scale=scale)
    del tmodel

    rng = np.random.default_rng(0)
    # smooth-ish natural-statistics input (pure noise under-weights the
    # low-frequency content real tiles have)
    base = rng.random((1, 32, 32, 3)).astype(np.float32)
    x = jax.image.resize(jnp.asarray(base), (1, 256, 256, 3), "cubic")
    x = jnp.clip(x, 0.0, 1.0)

    def forward(fused, tanh_gelu, dtype, tiled):
        cfg = SwinIRConfig(
            scale=scale, fused_reconstruct=fused, gelu_approximate=tanh_gelu,
            drop_path_rate=0.0,
        )
        model = build_model(cfg, dtype=dtype)

        def tile_fn(batch):
            return model.apply(variables, batch, train=False)

        if tiled:
            fn = jax.jit(lambda im: tiled_forward(tile_fn, im, scale, 64, 8).astype(jnp.float32))
        else:
            fn = jax.jit(lambda im: tile_fn(im).astype(jnp.float32))
        out = jax.block_until_ready(fn(x))
        return np.asarray(out)

    print("[ref] exact chain, erf, fp32(highest), untiled ...", flush=True)
    import functools
    # fp32 reference: exact chain + erf gelu, fp32 params/compute.
    # (TPU f32 matmuls here still carry bf16x3 passes unless XLA chooses
    # otherwise; the dtype floor row below isolates that.)
    A = forward(False, False, jnp.float32, tiled=False)
    rows = [
        ("bf16 exact-chain erf untiled (dtype floor)", (False, False, jnp.bfloat16, False)),
        ("bf16 fused erf untiled", (True, False, jnp.bfloat16, False)),
        ("bf16 exact-chain tanh untiled", (False, True, jnp.bfloat16, False)),
        ("bf16 production (fused+tanh) untiled", (True, True, jnp.bfloat16, False)),
        ("bf16 exact-chain erf TILED 64/8", (False, False, jnp.bfloat16, True)),
        ("bf16 production (fused+tanh) TILED 64/8", (True, True, jnp.bfloat16, True)),
        ("fp32 fused erf untiled (ring alone)", (True, False, jnp.float32, False)),
        ("fp32 exact-chain erf TILED (seams alone)", (False, False, jnp.float32, True)),
    ]
    ring = 3 * scale
    print(f"\n{'variant':45s} {'full dB':>9s} {'interior dB':>12s}", flush=True)
    for name, spec in rows:
        out = forward(*spec)
        full = psnr(out, A)
        interior = psnr(out[:, ring:-ring, ring:-ring], A[:, ring:-ring, ring:-ring])
        print(f"{name:45s} {full:9.2f} {interior:12.2f}", flush=True)


if __name__ == "__main__":
    main()

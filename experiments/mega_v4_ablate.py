"""Megakernel v4 ablation on real hardware: forward variants of the
SwinBlock megakernel (ops/pallas/fused_block.py) timed with the
interleaved on-device harness (utils/ablate.py).

Workload: one SwinIR-M-geometry block layer, 256x256x180 bf16, ws=8,
shift mask on (the harder case) and off, scale 1/sqrt(30).

Run on the TPU:  python experiments/mega_v4_ablate.py [variants...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.ops.pallas import fused_block as fb
from tpu_superresolution_tpu.utils.ablate import ablate, report

VARIANTS = sys.argv[1:] or [
    "v3", "exp2", "pair", "stackv", "exp2+pair", "exp2+stackv",
    "exp2+pair+stackv", "pair4",
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, H, W, C, nh, ws = 1, 256, 256, 180, 6, 8
    n = ws * ws
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    g1 = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * C) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)
    g2 = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    wfc1 = jnp.asarray(rng.standard_normal((C, 2 * C)) * 0.05, jnp.float32)
    bfc1 = jnp.asarray(rng.standard_normal(2 * C) * 0.05, jnp.float32)
    wfc2 = jnp.asarray(rng.standard_normal((2 * C, C)) * 0.05, jnp.float32)
    bfc2 = jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)) * 0.1, jnp.float32)
    nW = (H // ws) * (W // ws)
    mask_np = np.zeros((nW, n, n), np.float32)
    mask_np[::3, : n // 2, n // 2 :] = -100.0
    mask_np[::3, n // 2 :, : n // 2] = -100.0
    scale = float(1.0 / np.sqrt(30.0))

    def mk(variant, mask):
        @jax.jit
        def run():
            return fb.fused_swin_block(
                x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                wfc1, bfc1, wfc2, bfc2, bias, ws, mask=mask,
                scale=scale, gelu_approx=True, interpret=False,
                variant=variant,
            )
        return run

    # correctness spot-check vs v3 on device first (jitted: one compile
    # per variant, not one per trace-time eager op)
    ref = None
    for v in VARIANTS:
        out = jax.block_until_ready(mk(v, mask_np)())
        d = 0.0 if ref is None else float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        if ref is None:
            ref = out
        print(f"[check] {v}: max|diff vs v3| = {d:.3e}", flush=True)

    for label, mask in (("masked", mask_np), ("nomask", None)):
        cands = {v: mk(v, mask) for v in VARIANTS}
        res = ablate(cands, inner=30, rounds=5)
        print(f"\n=== {label} (ms per block layer) ===", flush=True)
        print(report(res), flush=True)


if __name__ == "__main__":
    main()

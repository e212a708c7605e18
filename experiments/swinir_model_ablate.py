"""Whole-model SwinIR-M A/B of megakernel variants + current-state
forward timing (256x256 x4 bf16, untiled)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.ops.pallas import fused_block as fb
from tpu_superresolution_tpu.utils.ablate import ablate, report
from tpu_superresolution_tpu.utils.flops import mfu, swinir_flops

VARIANTS = sys.argv[1:] or ["v3", "exp2", "stackv"]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = SwinIRConfig(scale=4, drop_path_rate=0.0)
    model = build_model(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32), jnp.bfloat16)
    variables = model.init(jax.random.key(0), x[:, :64, :64], train=False)

    def mk(variant):
        def thunk():
            fb.MEGA_VARIANT = variant
            return model.apply(variables, x, train=False).astype(jnp.float32)
        return thunk

    res = ablate({v: mk(v) for v in VARIANTS}, inner=10, rounds=5)
    print("\n=== SwinIR-M 256x256 x4 bf16 whole forward (ms) ===", flush=True)
    print(report(res), flush=True)
    fl = swinir_flops(cfg, 256, 256)
    best = min(r.min_s for r in res.values())
    print(f"\nflops/fwd = {fl/1e9:.1f} GFLOP; best MFU = {mfu(fl, best):.1%}", flush=True)
    fb.MEGA_VARIANT = "v3"


if __name__ == "__main__":
    main()

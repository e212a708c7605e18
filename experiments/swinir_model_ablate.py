"""Whole-model SwinIR-M A/B of megakernel variants + current-state
forward timing (256x256 x4 bf16, untiled).

Whole-model times (>10 ms) are reliable with plain host-loop timing
over the tunnel (CLAUDE.md); jit each variant once, interleave rounds.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.ops.pallas import fused_block as fb
from tpu_superresolution_tpu.utils.flops import mfu, swinir_flops

VARIANTS = sys.argv[1:] or ["v3", "exp2", "stackv"]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = SwinIRConfig(scale=4, drop_path_rate=0.0)
    model = build_model(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32), jnp.bfloat16)
    variables = model.init(jax.random.key(0), x[:, :64, :64], train=False)

    fns = {}
    for v in VARIANTS:
        def mk(v=v):
            @jax.jit
            def run(x):
                fb.MEGA_VARIANT = v
                return model.apply(variables, x, train=False)
            return run
        fns[v] = mk()
        t0 = time.perf_counter()
        jax.block_until_ready(fns[v](x))
        print(f"[compile] {v}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {v: [] for v in VARIANTS}
    for r in range(6):
        for v, fn in fns.items():
            n = 10
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(x)
            jax.block_until_ready(out)
            times[v].append((time.perf_counter() - t0) / n)
    print("\n=== SwinIR-M 256x256 x4 bf16 whole forward ===", flush=True)
    fl = swinir_flops(cfg, 256, 256)
    for v, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        best = min(ts[1:])  # drop round 0 (cold caches)
        med = sorted(ts[1:])[len(ts[1:]) // 2]
        print(f"{v:10s} min {best*1e3:7.2f} ms  median {med*1e3:7.2f} ms  "
              f"MFU {mfu(fl, best):.1%}", flush=True)
    fb.MEGA_VARIANT = "v3"


if __name__ == "__main__":
    main()

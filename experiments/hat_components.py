"""HAT component costs at production geometry (256x256x96 bf16, ws=7):
standalone OCAB (fused vs unfused), HAB (packed megakernel), CAB.
Small graphs -> fast compiles; host-loop timing with interleaved rounds.

Run on the TPU: python experiments/hat_components.py
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

from tpu_superresolution_tpu.models.hat import CAB, HAB, OCAB
from tpu_superresolution_tpu.ops.pallas import fused_ocab


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    H = W = 252  # 36x36 windows of 7 (the padded HAT eval geometry)
    C = 96
    dt = jnp.bfloat16
    x = jnp.asarray(rng.random((1, H, W, C), np.float32), dt)

    ocab = OCAB(C, 7, 0.5, 6, True, mlp_ratio=4.0, attn_impl="fused",
                gelu_approximate=True, dtype=dt)
    hab = HAB(C, 6, 7, 0, 3, 30, 0.01, 4.0, True, attn_impl="fused",
              gelu_approximate=True, dtype=dt)
    hab_s = HAB(C, 6, 7, 3, 3, 30, 0.01, 4.0, True, attn_impl="fused",
                gelu_approximate=True, dtype=dt)
    cab = CAB(3, 30, dt)

    fns = {}
    vo = ocab.init(jax.random.key(0), x)
    def mk_ocab(flag):
        @jax.jit
        def f(x):
            fused_ocab.ENABLE = flag
            return ocab.apply(vo, x)
        return f
    fns["ocab_fused"] = mk_ocab(True)
    fns["ocab_unfused"] = mk_ocab(False)
    for name, mod in (("hab", hab), ("hab_shift", hab_s), ("cab", cab)):
        v = mod.init(jax.random.key(0), x)
        fns[name] = jax.jit(lambda x, m=mod, v=v: m.apply(v, x))

    for name, fn in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        print(f"[compile] {name}: {time.perf_counter() - t0:.0f}s", flush=True)

    times = {t: [] for t in fns}
    for r in range(6):
        for tag, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = fn(x)
            jax.block_until_ready(out)
            times[tag].append((time.perf_counter() - t0) / 20)
    print(f"\n=== HAT components {H}x{W}x{C} bf16 (ms) ===", flush=True)
    for tag, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{tag:14s} min {min(ts)*1e3:7.3f}  median {sorted(ts)[len(ts)//2]*1e3:7.3f}",
              flush=True)
    fused_ocab.ENABLE = True


if __name__ == "__main__":
    main()

"""HAT train-step fwd/bwd split, fused vs unfused OCAB backward
(VERDICT r2 item 4).  b8 64px LR x4, bf16 — the reference finetune
workload shape.  Host-loop timing (steps are ~100 ms).

Run on the TPU: python experiments/hat_train_split.py
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

from tpu_superresolution_tpu.core.config import HATConfig, build_model
from tpu_superresolution_tpu.ops.pallas import fused_ocab


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = HATConfig(scale=4, attention_impl="fused", drop_path_rate=0.0)
    model = build_model(cfg, dtype=jnp.bfloat16)
    xb = jnp.asarray(rng.random((8, 64, 64, 3), np.float32), jnp.bfloat16)
    yb = jnp.asarray(rng.random((8, 256, 256, 3), np.float32), jnp.bfloat16)
    params = model.init(jax.random.key(0), xb, train=False)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, xb, train=False)
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - yb.astype(jnp.float32)))

    fns = {}
    for flag, tag in ((True, "fused"), (False, "unfused")):
        def mk_f(flag=flag):
            @jax.jit
            def f(p):
                fused_ocab.ENABLE = flag
                fused_ocab.INFERENCE_FUSED = flag  # train=False below
                return loss_fn(p)
            return f

        def mk_fb(flag=flag):
            @jax.jit
            def fb(p):
                fused_ocab.ENABLE = flag
                fused_ocab.INFERENCE_FUSED = flag
                l, g = jax.value_and_grad(loss_fn)(p)
                return l, jax.tree_util.tree_map(lambda a: jnp.sum(a), g)
            return fb

        for name, fn in ((f"{tag}_fwd", mk_f()), (f"{tag}_fwd_bwd", mk_fb())):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params))
            print(f"[compile] {name}: {time.perf_counter() - t0:.0f}s", flush=True)
            fns[name] = fn

    times = {t: [] for t in fns}
    for r in range(5):
        for tag, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(5):
                out = fn(params)
            jax.block_until_ready(out)
            times[tag].append((time.perf_counter() - t0) / 5)
    print("\n=== HAT train split (b8 64px x4, ms) ===", flush=True)
    for tag, ts in times.items():
        print(f"{tag:16s} min {min(ts)*1e3:7.2f}  median {sorted(ts)[len(ts)//2]*1e3:7.2f}",
              flush=True)
    fused_ocab.ENABLE = True
    fused_ocab.INFERENCE_FUSED = False


if __name__ == "__main__":
    main()

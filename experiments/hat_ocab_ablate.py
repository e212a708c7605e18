"""HAT whole-forward A/B: fused OCAB (round 3) vs unfused OCAB (round 2
behavior), plus train-step fwd/bwd split (VERDICT r2 items 2 and 4).

Whole-model times (>10 ms) use plain host-loop timing (reliable over
the tunnel per CLAUDE.md); candidates interleave across rounds.

Run on the TPU: python experiments/hat_ocab_ablate.py
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


def timed(fn, *args, rounds=5, inner=5):
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = HATConfig(scale=4, attention_impl="fused", drop_path_rate=0.0)
    x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32), jnp.bfloat16)
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), x[:, :64, :64], train=False)

    fns = {}
    for flag, tag in ((True, "ocab_fused"), (False, "ocab_unfused")):
        def mk(flag=flag):
            @jax.jit
            def run(x):
                fused_ocab.ENABLE = flag
                return model.apply(variables, x, train=False)
            return run
        fns[tag] = mk()
        t0 = time.perf_counter()
        jax.block_until_ready(fns[tag](x))
        print(f"[compile] {tag}: {time.perf_counter() - t0:.0f}s", flush=True)

    a = fns["ocab_fused"](x).astype(jnp.float32)
    b = fns["ocab_unfused"](x).astype(jnp.float32)
    print(f"[check] fused-vs-unfused max|diff| = {float(jnp.max(jnp.abs(a - b))):.3e}",
          flush=True)

    times = {t: [] for t in fns}
    for r in range(5):
        for tag, fn in fns.items():
            times[tag].append(timed(fn, x, rounds=1, inner=5))
    print("\n=== HAT 256x256 x4 bf16 whole forward ===", flush=True)
    for tag, ts in times.items():
        print(f"{tag:14s} min {min(ts)*1e3:7.2f} ms  median {sorted(ts)[len(ts)//2]*1e3:7.2f} ms",
              flush=True)

    # ---- train-step fwd/bwd split (b8, 64px LR, x4) ----
    xb = jnp.asarray(rng.random((8, 64, 64, 3), np.float32), jnp.bfloat16)
    yb = jnp.asarray(rng.random((8, 256, 256, 3), np.float32), jnp.bfloat16)
    vtrain = model.init(jax.random.key(0), xb, train=False)
    params = vtrain["params"]

    def loss_fn(params):
        out = model.apply({"params": params}, xb, train=False)
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - yb.astype(jnp.float32)))

    tfns = {}
    for flag, tag in ((True, "fused"), (False, "unfused")):
        def mk_f(flag=flag):
            @jax.jit
            def f(p):
                fused_ocab.ENABLE = flag
                return loss_fn(p)
            return f
        def mk_fb(flag=flag):
            @jax.jit
            def fb(p):
                fused_ocab.ENABLE = flag
                l, g = jax.value_and_grad(loss_fn)(p)
                return l, jax.tree_util.tree_map(lambda a: jnp.sum(a), g)
            return fb
        for name, fn in ((f"{tag}_fwd", mk_f()), (f"{tag}_fwd_bwd", mk_fb())):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params))
            print(f"[compile] {name}: {time.perf_counter() - t0:.0f}s", flush=True)
            tfns[name] = fn

    times = {t: [] for t in tfns}
    for r in range(5):
        for tag, fn in tfns.items():
            times[tag].append(timed(fn, params, rounds=1, inner=5))
    print("\n=== HAT train split (b8 64px x4, ms) ===", flush=True)
    for tag, ts in times.items():
        print(f"{tag:16s} min {min(ts)*1e3:7.2f}  median {sorted(ts)[len(ts)//2]*1e3:7.2f}",
              flush=True)
    fused_ocab.ENABLE = True


if __name__ == "__main__":
    main()

"""HAT whole-forward A/B: fused OCAB (round 3) vs unfused OCAB (round 2
behavior), plus train-step fwd/bwd split (VERDICT r2 items 2 and 4).

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
from tpu_superresolution_tpu.utils.ablate import ablate, report


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = HATConfig(scale=4, attention_impl="fused", drop_path_rate=0.0)
    x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32), jnp.bfloat16)
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), x[:, :64, :64], train=False)

    def fwd():
        return model.apply(variables, x, train=False).astype(jnp.float32)

    # unfused thunk: toggling the flag between traces gives two compiled
    # programs; each jit in ablate() captures its flag state at trace
    def mk(flag):
        def thunk():
            fused_ocab.ENABLE = flag
            return model.apply(variables, x, train=False).astype(jnp.float32)
        return thunk

    # correctness: fused vs unfused whole model
    fused_ocab.ENABLE = True
    a = jax.block_until_ready(jax.jit(fwd)())
    fused_ocab.ENABLE = False
    b = jax.block_until_ready(jax.jit(lambda: model.apply(variables, x, train=False).astype(jnp.float32))())
    print(f"[check] fused-vs-unfused OCAB max|diff| = {float(jnp.max(jnp.abs(a - b))):.3e}", flush=True)
    fused_ocab.ENABLE = True

    res = ablate({"ocab_fused": mk(True), "ocab_unfused": mk(False)},
                 inner=10, rounds=5)
    print("\n=== HAT 256x256 x4 bf16 whole forward (ms) ===", flush=True)
    print(report(res), flush=True)

    # ---- train-step fwd/bwd split (b8, 64px LR, x4) ----
    xb = jnp.asarray(rng.random((8, 64, 64, 3), np.float32), jnp.bfloat16)
    yb = jnp.asarray(rng.random((8, 256, 256, 3), np.float32), jnp.bfloat16)
    vtrain = model.init(jax.random.key(0), xb, train=False)

    def loss_fn(params):
        out = model.apply({"params": params}, xb, train=False)
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - yb.astype(jnp.float32)))

    params = vtrain["params"]

    def fwd_only():
        return loss_fn(params)

    def fwd_bwd():
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jax.tree_util.tree_reduce(
            lambda a, b_: a + jnp.sum(jnp.abs(b_).astype(jnp.float32)) * 0.0, g, 0.0
        )

    for flag, tag in ((True, "fused"), (False, "unfused")):
        fused_ocab.ENABLE = flag
        res2 = ablate({f"{tag}_fwd": fwd_only, f"{tag}_fwd_bwd": fwd_bwd},
                      inner=10, rounds=4)
        print(f"\n=== HAT train-step split (b8 64px x4, OCAB {tag}) ===", flush=True)
        print(report(res2), flush=True)
    fused_ocab.ENABLE = True


if __name__ == "__main__":
    main()

"""SwinIR TRAIN-step A/B: explicit rolls vs absorbed reads
(fused_block.ABSORB_TRAIN) on the reference's core workload shape
(finetune_swinir.py:148-179; b8 64px LR x4).

The read_shift custom_vjp (d8c4086) made the absorbed path
differentiable — forward reads stay absorbed, the backward pays two
rolls per shifted block (the same count the roll path pays in its
forward AND backward).  Expected win: the forward half of the step
drops its roll passes; the drop-path branch_scales ride the same
kernel.  Both cells run train=True with drop_path 0.1 (production
finetune config) and with drop_path 0 (from-scratch config class).

Run on the TPU: python experiments/swinir_train_absorb_ab.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_block as fb
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

rng = np.random.default_rng(0)
xb = jnp.asarray(rng.random((8, 64, 64, 3), np.float32), jnp.bfloat16)
yb = jnp.asarray(rng.random((8, 256, 256, 3), np.float32), jnp.bfloat16)

CASES = []
for dp in (0.1, 0.0):
    model = build_model(
        SwinIRConfig(scale=4, attention_impl="fused", drop_path_rate=dp),
        dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.key(0), xb, train=False)["params"]

    def mk(model=model, absorb=False):
        def loss_fn(p, key):
            out = model.apply(
                {"params": p}, xb, train=True, rngs={"drop_path": key}
            )
            return jnp.mean(
                jnp.abs(out.astype(jnp.float32) - yb.astype(jnp.float32))
            )

        @jax.jit
        def step(p, key):
            fb.ABSORB_TRAIN = absorb  # trace-time global
            l, g = jax.value_and_grad(loss_fn)(p, key)
            return l, jax.tree_util.tree_map(jnp.sum, g)

        return step

    for tag, absorb in ((f"dp{dp}/rolls", False), (f"dp{dp}/absorb", True)):
        CASES.append((tag, mk(model, absorb), params))

key = jax.random.key(7)
fns = {}
for tag, fn, params in CASES:
    t0 = time.time()
    try:
        jax.block_until_ready(fn(params, key))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:1500]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = (fn, params)
fb.ABSORB_TRAIN = False

ts = {n: [] for n in fns}
for r in range(6):
    for n, (fn, params) in fns.items():
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = fn(params, key)
        jax.block_until_ready(out)
        ts[n].append((time.perf_counter() - t0) / 5)
print("\n=== SwinIR train step (b8 64px x4, ms) ===", flush=True)
for n, v_ in ts.items():
    print(f"{n:14s} min {min(v_)*1e3:7.2f}  median {sorted(v_)[len(v_)//2]*1e3:7.2f}",
          flush=True)
print("RC=0", flush=True)

"""SwinIR finetune-step A/B over trunk-conv impl (VERDICT r3 item 6).

The reference's core workload is the SwinIR finetune step
(finetune_swinir.py:148-179; b8 64px LR x4 — 63.2 ms round 2).  The
conv-impl flags were only ever measured on inference forwards; this
measures the TRAIN step (fwd+bwd through the Pallas megakernel) per
conv impl so the flag flip from conv_impl_ab is validated on the
training path too.  Host-loop timing (steps ~60 ms).

Run on the TPU: python experiments/swinir_train_ab.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.blocks as blocks
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

rng = np.random.default_rng(0)
xb = jnp.asarray(rng.random((8, 64, 64, 3), np.float32), jnp.bfloat16)
yb = jnp.asarray(rng.random((8, 256, 256, 3), np.float32), jnp.bfloat16)
model = build_model(SwinIRConfig(scale=4, attention_impl="fused"),
                    dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), xb, train=False)["params"]


def loss_fn(p):
    out = model.apply({"params": p}, xb, train=False)
    return jnp.mean(jnp.abs(out.astype(jnp.float32) - yb.astype(jnp.float32)))


cases = [("conv=xla", "xla"), ("conv=gemm", "gemm"), ("conv=halo", "halo")]
fns = {}
for tag, cv in cases:
    def mk(cv=cv):
        @jax.jit
        def step(p):
            blocks.CONV3X3_IMPL = cv  # trace-time global
            l, g = jax.value_and_grad(loss_fn)(p)
            return l, jax.tree_util.tree_map(jnp.sum, g)
        return step
    fn = mk()
    t0 = time.time()
    try:
        jax.block_until_ready(fn(params))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn
blocks.CONV3X3_IMPL = "xla"

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = fn(params)
        jax.block_until_ready(out)
        ts[n].append((time.perf_counter() - t0) / 5)
print("\n=== SwinIR train step (b8 64px x4, ms) ===", flush=True)
for n, v_ in ts.items():
    print(f"{n:12s} min {min(v_)*1e3:7.2f}  median {sorted(v_)[len(v_)//2]*1e3:7.2f}", flush=True)
print("RC=0", flush=True)

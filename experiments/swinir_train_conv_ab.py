"""SwinIR TRAIN-step A/B: trunk-conv impl on the reference's core
workload shape (finetune_swinir.py:148-179; b8 64px LR x4).

Question: the round-2 train step measured 63.2 ms with XLA convs;
after the halo flip (96c576a) the absorb A/B measured ~73-75 ms.
Cross-day tunnel variance is large (hat_train 97.9 vs 131.6 on the
same code), so this interleaves the candidates same-day:

  xla        — all trunk/input/upsampler convs lax.conv (round-2 path)
  halo/gemm  — halo forward, custom vjp through conv3x3_gemm (current
               default: 9 transposed GEMMs in the backward)
  halo/xla   — halo forward, custom vjp through lax.conv (cab_conv.
               BWD_IMPL="xla": XLA's transposed-conv backward)

All cells run train=True, drop_path 0.1 (production finetune config).
Decision: if halo/* loses to xla on the STEP, gate the halo default
off for training (train=True call sites pass impl="xla"); if halo/xla
wins halo/gemm, flip BWD_IMPL.

Run on the TPU: python experiments/swinir_train_conv_ab.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.blocks as blocks
import tpu_superresolution_tpu.ops.fused_upsample as fu
import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

rng = np.random.default_rng(0)
xb = jnp.asarray(rng.random((8, 64, 64, 3), np.float32), jnp.bfloat16)
yb = jnp.asarray(rng.random((8, 256, 256, 3), np.float32), jnp.bfloat16)

model = build_model(
    SwinIRConfig(scale=4, attention_impl="fused", drop_path_rate=0.1),
    dtype=jnp.bfloat16,
)
params = model.init(jax.random.key(0), xb, train=False)["params"]


def mk(conv, bwd):
    def loss_fn(p, key):
        out = model.apply(
            {"params": p}, xb, train=True, rngs={"drop_path": key}
        )
        return jnp.mean(
            jnp.abs(out.astype(jnp.float32) - yb.astype(jnp.float32))
        )

    @jax.jit
    def step(p, key):
        # trace-time globals (read inside module __call__ during trace)
        blocks.CONV3X3_IMPL = conv
        blocks.CONV3X3_INPUT_IMPL = conv
        fu.CONV_IMPL = conv
        cc.BWD_IMPL = bwd
        l, g = jax.value_and_grad(loss_fn)(p, key)
        return l, jax.tree_util.tree_map(jnp.sum, g)

    return step


CASES = [
    ("xla", mk("xla", "gemm")),
    ("halo/gemm", mk("halo", "gemm")),
    ("halo/xla", mk("halo", "xla")),
]

key = jax.random.key(7)
fns = {}
for tag, fn in CASES:
    t0 = time.time()
    try:
        jax.block_until_ready(fn(params, key))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:1500]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn
blocks.CONV3X3_IMPL = blocks.CONV3X3_INPUT_IMPL = "halo"
fu.CONV_IMPL = "halo"
cc.BWD_IMPL = "gemm"

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = fn(params, key)
        jax.block_until_ready(out)
        ts[n].append((time.perf_counter() - t0) / 5)
print("\n=== SwinIR train step (b8 64px x4, dp0.1, ms) ===", flush=True)
for n, v_ in ts.items():
    print(f"{n:10s} min {min(v_)*1e3:7.2f}  median {sorted(v_)[len(v_)//2]*1e3:7.2f}",
          flush=True)
print("RC=0", flush=True)

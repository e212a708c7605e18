"""DAT spatial-attention softmax dtype A/B (VERDICT r3 weak #2).

The round-3 floor analysis (PARITY.md) put the spatial DATB at ~1.8x
its combined HBM floor with ~805 MB of fp32 attention maps per block
as the dominant term.  SOFTMAX_FP32=False keeps the [B,nW,nh,N,N]
softmax in bf16, halving that traffic with zero kernel work.  Also
reports the output delta so the quality cost is quantified alongside
the speed.  Production config (dat_arch.py:862-883), 256x256 x4 bf16.

Run on the TPU: python experiments/dat_bf16_maps_ab.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.dat as datmod
from tpu_superresolution_tpu.core.config import DATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

cases = [("softmax=fp32", True), ("softmax=bf16", False)]
fns, outs = {}, {}
for tag, flag in cases:
    datmod.SOFTMAX_FP32 = flag
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
datmod.SOFTMAX_FP32 = True

if len(outs) == 2:
    a, b = outs["softmax=fp32"], outs["softmax=bf16"]
    d = np.abs(a - b)
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-20))
    print(f"maxdiff {float(d.max()):.2e}  delta-psnr {psnr:.1f} dB "
          f"(bf16 floor ~64 dB)", flush=True)

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:14s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

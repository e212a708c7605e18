"""HAT whole-forward A/B: PACKED_QK_NOPAD (drop q/k head-pad lanes,
qkv GEMM width 576 -> 384 at C=96/nh=6/hd=16) x PACKED_GROUP re-sweep.

The packed path is latency-bound on its serial per-step chain
(PARITY.md round 3: ~28 us x ~86 grid steps); nopad shrinks the qkv
GEMM and every q/k VMEM temp, which may also move the group-size
sweet spot (group 32 regressed at the padded layout's VMEM appetite).
Outputs are bitwise identical to the padded layout (pad lanes are
exact zeros in the contraction; CPU parity test_packed_qk_nopad).

Run on the TPU: python experiments/hat_qk_nopad_ab.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_block as fb
from tpu_superresolution_tpu.core.config import HATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))

model = build_model(HATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

CASES = [
    ("pad/g16", False, 16),
    ("nopad/g16", True, 16),
    ("nopad/g24", True, 24),
    ("nopad/g32", True, 32),
]

fns, outs = {}, {}
for tag, nopad, group in CASES:
    fb.PACKED_QK_NOPAD = nopad
    fb.PACKED_GROUP = group
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn
    outs[tag] = np.asarray(o, np.float32)
fb.PACKED_QK_NOPAD = False
fb.PACKED_GROUP = 16
for tag in list(outs):
    if tag != "pad/g16" and "pad/g16" in outs:
        d = float(np.max(np.abs(outs[tag] - outs["pad/g16"])))
        print(f"maxdiff {tag} vs pad/g16: {d:.2e}", flush=True)

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:12s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

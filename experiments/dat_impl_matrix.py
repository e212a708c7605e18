"""DAT whole-forward matrix: LN impl x depthwise-conv impl x trunk-conv
impl — one axis flipped per case vs baseline."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.blocks as blocks
import tpu_superresolution_tpu.models.dat as datmod
from tpu_superresolution_tpu.core.config import DATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

# (tag, ln_impl, dw_impl, conv_impl, softmax_fp32) — base = round-2
# measured config (dat.LN_IMPL "xla" default; 136.4 ms round 2 vs 206.8
# with Pallas LNs).  Trimmed round-4 (compiles ~20 min/case today):
# dropped dw=halo / conv=halo; added the bf16 softmax-maps case
# (VERDICT r3 weak #2 — the ~805 MB fp32 attention-map HBM term).
cases = [
    ("base(lnxla,dwxla,cxla)", "xla", "xla", "xla", True),
    ("ln=pallas",              None,  "xla", "xla", True),
    ("conv=gemm",              "xla", "xla", "gemm", True),
    ("softmax=bf16",           "xla", "xla", "xla", False),
]
fns, outs = {}, {}
for tag, ln, dw, cv, smf in cases:
    datmod.LN_IMPL = ln
    blocks.DWCONV3X3_IMPL = dw
    blocks.CONV3X3_IMPL = cv
    datmod.SOFTMAX_FP32 = smf
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
datmod.LN_IMPL = "xla"
blocks.DWCONV3X3_IMPL = "xla"
blocks.CONV3X3_IMPL = "xla"
datmod.SOFTMAX_FP32 = True
base = outs.get(cases[0][0])
for tag, o in outs.items():
    if base is not None and tag != cases[0][0]:
        print(f"maxdiff {tag}: {float(np.max(np.abs(o - base))):.2e}", flush=True)
ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:22s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

"""DAT fused-rect A/B at 256^2 (round-5 phase 10): the rect kernel
decoupled from the (Mosaic-dead-at-256^2) fused tail.

fused_tail_diag4 (2026-08-20): the tail's group8 SGFN dwconv is
rejected at 256^2 -> FUSED_TAIL stays off at the bench shape.
fused_rect_diag2: the NON-SHIFTED rect kernel compiles at 256^2 at
every diag level incl. full (26.8 s); shifted dies at level>=3.
This A/B measures the remaining viable configuration: rect kernel on
non-shifted spatial blocks (~1/4 of all DATBs) + module tail, vs the
all-module baseline — interleaved same-session cells per the >=2% rule.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
from tpu_superresolution_tpu.core.config import DATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

ft.FUSED_TAIL = "off"
cases = [
    ("base(all module)", "off", "off"),
    ("rect(non-shifted)", "on", "off"),
    ("rect(+shifted)", "on", "on"),
]
fns, outs = {}, {}
for tag, rect, rect_sh in cases:
    fr.FUSED_RECT = rect
    fr.FUSED_RECT_SHIFTED = rect_sh
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
fr.FUSED_RECT = "off"
fr.FUSED_RECT_SHIFTED = "off"
base = outs.get(cases[0][0])
for tag, o in outs.items():
    if base is not None and tag != cases[0][0]:
        print(f"maxdiff {tag}: {float(np.max(np.abs(o - base))):.2e}",
              flush=True)
ts = {n: [] for n in fns}
for r in range(8):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:22s} min {min(v_)*1e3:7.2f} ms "
          f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("ALL DONE", flush=True)

"""DAT fused-tail A/B (VERDICT r4 next-step #3): whole-forward 256x256
x4 bf16, module tail vs the fused AIM+proj+LN2+SGFN kernel at strip
rows 8 and 16 — interleaved same-session cells per the >=2% rule.

Round-3 floor analysis context: spatial DATB 3.64 ms ~= 1.8x its HBM
floor; SGFN standalone 1.98 ms ~= 8x floor.  The fused tail removes
the ten-plus HBM round trips of the block tail for all 36 blocks."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
from tpu_superresolution_tpu.core.config import DATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

# s16 dropped: fused_tail_diag measured it Mosaic-rejected at diag
# level 2 already (VMEM — the [4608,360] f32 fc1 block alone) while s8
# passes levels 0-2; the level-3 dwconv rejection was reworked
# (scalar halo keeps, [1,1,half] tap broadcasts) and re-validated in
# fused_tail_diag2 before this A/B reruns.
cases = [
    ("base(module tail)", "off", 8),
    ("fused s8", "on", 8),
]
fns, outs = {}, {}
for tag, flag, s in cases:
    ft.FUSED_TAIL = flag
    ft.STRIP_ROWS = s
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
ft.FUSED_TAIL = "off"
ft.STRIP_ROWS = 8
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
print("ALL DONE", flush=True)

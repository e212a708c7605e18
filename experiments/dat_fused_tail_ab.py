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
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
from tpu_superresolution_tpu.core.config import DATConfig, build_model

# pick the dwconv column-shift impl by a quick standalone probe (the
# remote Mosaic's acceptance is the ground truth here)
def _probe_dw():
    r = np.random.default_rng(1)
    g = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    xx = g(1, 64, 256, 180).astype(jnp.bfloat16)
    kw = dict(
        sp_w1=g(180, 11), sp_b1=g(11), sp_w2=g(11, 1), sp_b2=g(1),
        wproj=g(180, 180) * 0.05, bproj=g(180), g2=g(180), b2=g(180),
        wfc1=g(180, 360) * 0.05, bfc1=g(360), gsg=g(180), bsg=g(180),
        wdw=g(3, 3, 1, 180) * 0.1, bdw=g(180), wfc2=g(180, 180) * 0.05,
        bfc2=g(180),
    )
    for dw in ("mxu", "group8"):
        ft.DW_COLS = dw
        try:
            jax.block_until_ready(jax.jit(
                lambda a: ft.fused_datb_tail(a, a, a, jnp.ones((1, 180)), **kw)
            )(xx))
            print(f"[probe] DW_COLS={dw} compiles", flush=True)
            return dw
        except Exception as e:
            print(f"[probe] DW_COLS={dw} rejected: {str(e)[:160]}", flush=True)
    return None

dw = _probe_dw()
if dw is None:
    print("[probe] no dwconv impl compiles — fused tail is dead on this "
          "compiler; recording and exiting", flush=True)
    print("ALL DONE", flush=True)
    raise SystemExit(0)
ft.DW_COLS = dw

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

# s16 dropped: fused_tail_diag measured it Mosaic-rejected at diag
# level 2 already (VMEM — the [4608,360] f32 fc1 block alone) while s8
# passes levels 0-2.  Third cell adds the fused dual-rect attention
# kernel (whole spatial block = 2 kernels + tiny XLA glue).
cases = [
    ("base(module tail)", "off", "off", "off"),
    ("fused tail s8", "on", "off", "off"),
    ("tail+rect s8", "on", "on", "off"),
    ("tail+rect+shift s8", "on", "on", "on"),
]
fns, outs = {}, {}
for tag, flag, rect, rect_sh in cases:
    ft.FUSED_TAIL = flag
    fr.FUSED_RECT = rect
    fr.FUSED_RECT_SHIFTED = rect_sh
    ft.STRIP_ROWS = 8
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
fr.FUSED_RECT = "off"
fr.FUSED_RECT_SHIFTED = "off"
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

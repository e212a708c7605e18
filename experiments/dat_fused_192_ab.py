"""DAT fused-kernel stack A/B at the production tile shape (192^2 —
evaluate/tiling.py production rec tile=192).  Round-5 phase 19.

dat_fused_chan_ab(256) showed rect saves ~24 ms at 256^2 but the
rect-only whole-model compile crashes there (chipless-AOT axon bug,
RECT_MAX_PIX=192^2 gate).  Production tiled inference runs 192^2
tiles, so the decisive default-flip measurement is the tile-shape
stack WITHOUT the measured-loss chan kernel:

  base            all module chains (production today)
  rect            non-shifted spatial blocks fused (9 call sites)
  rect+shift      + shifted spatial blocks (SHIFT_CHUNK=8 kernels)
  rect+shift+tail + fused DATB tail (AIM+proj+LN2+SGFN)

Interleaved same-session timing per the >=2% rule."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
import tpu_superresolution_tpu.ops.pallas.fused_channel_attn as fc
from tpu_superresolution_tpu.core.config import DATConfig, build_model

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 192
print("input size:", SIZE, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, SIZE, SIZE, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

fc.FUSED_CHAN = "off"
# (tag, rect, rect_shifted, tail)
cases = [
    ("base(all module)", "off", "off", "off"),
    ("rect", "on", "off", "off"),
    ("rect+shift", "on", "on", "off"),
    ("rect+shift+tail", "on", "on", "on"),
]
fns, outs = {}, {}
for tag, rect, rect_sh, tail in cases:
    fr.FUSED_RECT = rect
    fr.FUSED_RECT_SHIFTED = rect_sh
    ft.FUSED_TAIL = tail
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:1500]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
fr.FUSED_RECT = "off"
fr.FUSED_RECT_SHIFTED = "off"
ft.FUSED_TAIL = "off"
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
med = {}
for n, v_ in ts.items():
    med[n] = sorted(v_)[len(v_) // 2] * 1e3
    print(f"{n:18s} min {min(v_)*1e3:7.2f} ms "
          f"median {med[n]:7.2f} ms", flush=True)

# Batched confirmation: production tiling stacks tiles into one
# batched forward (evaluate/tiling.py), so confirm the best fused cell
# still wins at b=4 before any default flip.
if len(med) > 1:
    best = min((t for t in med if t != cases[0][0]), key=med.get)
    cfg = {t: (r, s, tl) for t, r, s, tl in cases}
    xb = jnp.asarray(rng.random((4, SIZE, SIZE, 3), np.float32))
    bts = {}
    for tag in (cases[0][0], best):
        fr.FUSED_RECT, fr.FUSED_RECT_SHIFTED, ft.FUSED_TAIL = cfg[tag]
        fn = jax.jit(lambda b, model=model, v=v: model.apply(
            v, b, train=False))
        t0 = time.time()
        try:
            jax.block_until_ready(fn(xb))
        except Exception as e:
            print(f"[FAIL b4] {tag}: {type(e).__name__}: {str(e)[:800]}",
                  flush=True)
            continue
        print(f"[compile b4] {tag}: {time.time()-t0:.0f}s", flush=True)
        bts[tag] = fn
    fr.FUSED_RECT = "off"; fr.FUSED_RECT_SHIFTED = "off"
    ft.FUSED_TAIL = "off"
    tb = {n: [] for n in bts}
    for r in range(6):
        for n, fn in bts.items():
            t0 = time.perf_counter()
            for _ in range(2):
                o = fn(xb)
            jax.block_until_ready(o)
            tb[n].append((time.perf_counter() - t0) / 2)
    for n, v_ in tb.items():
        print(f"b4 {n:18s} min {min(v_)*1e3:7.2f} ms "
              f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("ALL DONE", flush=True)

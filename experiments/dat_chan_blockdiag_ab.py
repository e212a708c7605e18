"""DAT channel-attention blockdiag-XLA A/B at 256^2 (round-5 phase 16).

dat_fused_chan_ab measured the two-phase Pallas channel kernel at
+18.7 ms (latency-bound strip chain) — but its gram factorization
enables a pure-XLA full-[C,C] reformulation with no channel-major
relayouts (models/dat.py CHAN_ATTN_IMPL="blockdiag").  Cells:

  base        heads einsums (production)
  blockdiag   full-[C,C] masked formulation
  rect        rect kernel only, ceiling overridden — the direct 256^2
              measurement ab3 never got (chan+rect COMPILED at 256^2
              in the chan A/B process, so the rect-only crash is at
              least partly flaky)
  blockdiag+rect  the best-case stack

Interleaved same-session timing per the >=2% rule."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.dat as datmod
import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
import tpu_superresolution_tpu.ops.pallas.fused_channel_attn as fc
from tpu_superresolution_tpu.core.config import DATConfig, build_model

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
print("input size:", SIZE, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, SIZE, SIZE, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

ft.FUSED_TAIL = "off"
fc.FUSED_CHAN = "off"
fr.FUSED_RECT_SHIFTED = "off"
cases = [
    ("base(heads)", "heads", "off"),
    ("blockdiag", "blockdiag", "off"),
    ("rect", "heads", "on"),
    ("blockdiag+rect", "blockdiag", "on"),
]
fns, outs = {}, {}
for tag, chan_impl, rect in cases:
    datmod.CHAN_ATTN_IMPL = chan_impl
    fr.FUSED_RECT = rect
    fr.RECT_MAX_PIX = None  # 256^2 escape attempt — ceiling overridden
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:1500]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
datmod.CHAN_ATTN_IMPL = "heads"
fr.FUSED_RECT = "off"
fr.RECT_MAX_PIX = 192 * 192
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
    print(f"{n:16s} min {min(v_)*1e3:7.2f} ms "
          f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("ALL DONE", flush=True)

"""DAT fused-stack decomposition A/B at 192^2 (round-5 phase 18c).

dat_fused_192_ab measured base 89.56 / rect 96.47 (LOSS) /
rect+shift 90.54 / rect+shift+tail **62.55 ms (-30%)** — the tail
kernel is the winner and rect may be dragging.  Decompose to pick the
production default stack:

  base             all module chains
  tail             fused DATB tail only (both block types)
  blockdiag+tail   + the XLA blockdiag channel attention (won 6.2%
                   at 256^2)
  bd+rect+sh+tail  the full stack (does rect's drag persist under
                   blockdiag?)

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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 192
print("input size:", SIZE, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, SIZE, SIZE, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)

fc.FUSED_CHAN = "off"
# (tag, chan_impl, rect, rect_shifted, tail)
cases = [
    ("base", "heads", "off", "off", "off"),
    ("tail", "heads", "off", "off", "on"),
    ("blockdiag+tail", "blockdiag", "off", "off", "on"),
    ("bd+rect+sh+tail", "blockdiag", "on", "on", "on"),
]
fns, outs = {}, {}
for tag, chan_impl, rect, rect_sh, tail in cases:
    datmod.CHAN_ATTN_IMPL = chan_impl
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
datmod.CHAN_ATTN_IMPL = "heads"
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
for n, v_ in ts.items():
    print(f"{n:16s} min {min(v_)*1e3:7.2f} ms "
          f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("ALL DONE", flush=True)

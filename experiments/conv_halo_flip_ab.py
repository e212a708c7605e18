"""Halo-conv flip validation with VMEM-sized rows (_fit_rows, d8c4086).

Round-4 session-3 measured trunk conv=halo winning at the bench shape
(bench_shape_ab: 53.00 vs 54.64 ms b25/t64; real bench program 50.53 vs
51.79 ms) but the 256^2 case crashed Mosaic with rows=32 (VMEM OOM —
mosaic_diag).  cab_conv now sizes rows to a 15 MB scoped-VMEM budget,
so 256^2 should compile (rows~10) or fall back to XLA.  This decides
the CONV3X3_IMPL default:

  flip to "halo" iff bench-shape win holds (>=2%) AND 256^2 does not
  regress vs xla.

Also crosses the two remaining halo sites at the bench shape only:
input conv (Cin=3) and the fused-upsample 5x5 (conv_halo pad=2).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.blocks as blocks
import tpu_superresolution_tpu.ops.fused_upsample as fu
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

rng = np.random.default_rng(0)
ximg = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
xt = jnp.asarray(rng.random((25, 64, 64, 3), np.float32))

model = build_model(SwinIRConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), ximg[:, :64, :64], train=False)

# (tag, trunk_impl, input_impl, upsample_impl, inputs)
CASES = [
    ("256/xla",        "xla",  "xla",  "xla",  "img"),
    ("256/halo",       "halo", "xla",  "xla",  "img"),
    ("b25/xla",        "xla",  "xla",  "xla",  "tile"),
    ("b25/halo",       "halo", "xla",  "xla",  "tile"),
    ("b25/halo+first", "halo", "halo", "xla",  "tile"),
    ("b25/halo+up",    "halo", "xla",  "halo", "tile"),
    ("b25/halo+all",   "halo", "halo", "halo", "tile"),
]
fns, outs, xin_of = {}, {}, {}
for tag, trunk, first, up, which in CASES:
    blocks.CONV3X3_IMPL = trunk
    blocks.CONV3X3_INPUT_IMPL = first
    fu.CONV_IMPL = up
    xin = ximg if which == "img" else xt
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(xin))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:2000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32); xin_of[tag] = xin
blocks.CONV3X3_IMPL = "xla"
blocks.CONV3X3_INPUT_IMPL = "xla"
fu.CONV_IMPL = "xla"

for base, cand in (("256/xla", "256/halo"), ("b25/xla", "b25/halo"),
                   ("b25/xla", "b25/halo+all")):
    if base in outs and cand in outs:
        d = float(np.max(np.abs(outs[base] - outs[cand])))
        print(f"maxdiff {cand} vs {base}: {d:.2e}", flush=True)

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        xin = xin_of[n]
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(xin)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:15s} min {min(v_)*1e3:7.2f} ms "
          f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

"""Bench-shape (b=25 tile-64) follow-up A/B under the new ABSORB_ROLLS
default: the two cells the round-3 queue never crossed with absorb.

  - conv=halo: won by ~1.4 ms over xla at b25 WITH rolls
    (experiments/logs/conv_impl_ab.log) but crashes Mosaic at 256^2 —
    bench-only value if it survives next to the absorb kernels.
  - padfold: force the PAD fold (b=25 -> pad to 26 -> 13 folded strips)
    instead of the default odd SPLIT (24 folded + 1 tail).  The pad
    costs 1/25 extra compute (~2 ms) but removes the tail kernel's
    separate dispatch chain; unmeasured under absorb.

Also times the REAL bench program (jit'd tiled_forward, 256^2 -> 1024^2)
for the winning flags so the bench.py expectation is grounded.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.blocks as blocks
import tpu_superresolution_tpu.ops.pallas.fused_block as fb
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.evaluate.tiling import tiled_forward

assert fb.ABSORB_ROLLS, "this A/B assumes the flipped default"

rng = np.random.default_rng(0)
xt = jnp.asarray(rng.random((25, 64, 64, 3), np.float32))
ximg = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))

model = build_model(SwinIRConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), ximg[:, :64, :64], train=False)

CASES = [  # (tag, conv_impl, fold_odd_min_b)
    ("base(xla,split)", "xla", 48),
    ("halo", "halo", 48),
    ("padfold", "xla", 25),
    ("halo+padfold", "halo", 25),
]
fns, outs = {}, {}
for tag, conv, fomb in CASES:
    blocks.CONV3X3_IMPL = conv
    fb.FOLD_ODD_MIN_B = fomb
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(xt))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
blocks.CONV3X3_IMPL = "xla"
fb.FOLD_ODD_MIN_B = 48

base = outs.get("base(xla,split)")
for tag, o in outs.items():
    if base is not None and tag != "base(xla,split)":
        print(f"maxdiff {tag}: {float(np.max(np.abs(o - base))):.2e}", flush=True)

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(xt)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"b25t64/{n:16s} min {min(v_)*1e3:7.2f} ms "
          f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)

# Whole bench program (tiled_forward as ONE jit, bench.py's exact
# workload) for base flags vs the best cell above — grounds the
# MPix/s expectation without burning a bench.py run per cell.
best = min(ts, key=lambda n: min(ts[n]))
for tag in dict.fromkeys(["base(xla,split)", best]):
    if tag not in fns:
        continue
    conv, fomb = next((c, f) for t, c, f in CASES if t == tag)
    blocks.CONV3X3_IMPL = conv
    fb.FOLD_ODD_MIN_B = fomb

    @jax.jit
    def run(img, model=model, v=v):
        return tiled_forward(
            lambda b: model.apply(v, b, train=False), img, 4, tile=64, overlap=8
        ).astype(jnp.float32)

    t0 = time.time()
    try:
        o = jax.block_until_ready(run(ximg))
    except Exception as e:
        print(f"[FAIL] bench/{tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] bench/{tag}: {time.time()-t0:.0f}s", flush=True)
    best_dt = []
    for r in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            o = run(ximg)
        jax.block_until_ready(o)
        best_dt.append((time.perf_counter() - t0) / 5)
    dt = min(best_dt)
    print(f"bench/{tag}: {dt*1e3:.2f} ms = {1024*1024/1e6/dt:.2f} MPix/s",
          flush=True)
blocks.CONV3X3_IMPL = "xla"
fb.FOLD_ODD_MIN_B = 48
print("RC=0", flush=True)

"""HAT whole-forward A/B: classic packed vs spatial packed kernel."""
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

import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
import tpu_superresolution_tpu.models.blocks as blocks

# Trimmed round-4: compiles measured ~23 min/case over today's tunnel
# (4-5x round 3) — keep the four decisive cells; trunk-halo and stackv
# re-enter only if spatial wins (they compose with the winner).
cases = [
    ("classic/v3", False, "v3", False, "xla"),
    ("classic/v3+cab", False, "v3", True, "xla"),
    ("spatial/v3", True, "v3", False, "xla"),
    ("spatial/v3+cab", True, "v3", True, "xla"),
]
fns, outs = {}, {}
for tag, sp, var, cab, cv in cases:
    fb.SPATIAL_PACKED = sp
    fb.PACKED_VARIANT = var
    cc.ENABLE = cab
    blocks.CONV3X3_IMPL = cv
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
fb.SPATIAL_PACKED = False
fb.PACKED_VARIANT = "v3"
cc.ENABLE = False
blocks.CONV3X3_IMPL = "xla"
base = outs.get("classic/v3")
for tag, o in outs.items():
    if base is not None and tag != "classic/v3":
        print(f"maxdiff {tag} vs classic: {float(np.max(np.abs(o - base))):.2e}",
              flush=True)
ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:20s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms",
          flush=True)
print("RC=0", flush=True)

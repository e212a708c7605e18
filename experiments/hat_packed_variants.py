"""HAT whole-forward A/B: packed-kernel variants v3 / stackv / exp2+stackv."""
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

fns, outs = {}, {}
for tag in ("v3", "stackv", "pair4", "pair4+stackv", "exp2+pair4+stackv"):
    fb.PACKED_VARIANT = tag
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn
    outs[tag] = np.asarray(o, np.float32)
fb.PACKED_VARIANT = "v3"
for tag in ("stackv", "pair4", "pair4+stackv", "exp2+pair4+stackv"):
    if tag in outs and "v3" in outs:
        d = float(np.max(np.abs(outs[tag] - outs["v3"])))
        print(f"maxdiff {tag} vs v3: {d:.2e}", flush=True)

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:12s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

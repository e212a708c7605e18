"""hat_fast (ws=8) vs hat (ws=7) production-shape forward A/B
(VERDICT r4 next-step #5): 256x256 x4 bf16 whole-forward, interleaved
same-session cells.  The ws=7 floor is CLOSED at ~79.7 ms (every lever
measured — PARITY.md); round-2 measured the ws=8 packed variant at
61.8 ms.  This banks the current-defaults number for the preset row."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

from tpu_superresolution_tpu.core.config import (
    HATConfig, HATFastConfig, build_model,
)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))

cases = [
    ("hat ws=7 (parity)", HATConfig(scale=4)),
    ("hat_fast ws=8", HATFastConfig(scale=4)),
]
fns = {}
for tag, cfg in cases:
    model = build_model(cfg, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn
ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            o = fn(x)
        jax.block_until_ready(o)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:20s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("ALL DONE", flush=True)

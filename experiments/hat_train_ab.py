"""HAT train-step A/B: classic vs spatial+fusedCAB forward (b8, 64px LR,
x4, drop_path active), Pallas backward both ways."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
import optax
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_block as fb
import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
from tpu_superresolution_tpu.core.config import HATConfig, build_model

rng = np.random.default_rng(0)
lr_img = jnp.asarray(rng.random((8, 64, 64, 3), np.float32))
hr_img = jnp.asarray(rng.random((8, 256, 256, 3), np.float32))
model = build_model(HATConfig(scale=4, drop_path_rate=0.1), dtype=jnp.bfloat16)
v = model.init({"params": jax.random.key(0), "drop_path": jax.random.key(1)},
               lr_img[:1], train=True)
tx = optax.adam(1e-4)
opt = tx.init(v["params"])

def make_step():
    @jax.jit
    def step(params, opt, lo, hi, key):
        def loss_fn(p):
            out = model.apply({"params": p}, lo, train=True,
                              rngs={"drop_path": key})
            return jnp.mean((out.astype(jnp.float32) - hi) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, up), opt2, l
    return step

cases = [("classic", False, False), ("spatial+cab", True, True)]
fns = {}
key = jax.random.key(2)
for tag, sp, cab in cases:
    fb.SPATIAL_PACKED = sp
    cc.ENABLE = cab
    fn = make_step()
    t0 = time.time()
    try:
        p2, o2, l = fn(v["params"], opt, lr_img, hr_img, key)
        jax.block_until_ready(l)
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:4000]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s loss={float(l):.5f}", flush=True)
    fns[tag] = fn
fb.SPATIAL_PACKED = False
cc.ENABLE = False
ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            p2, o2, l = fn(v["params"], opt, lr_img, hr_img, key)
        jax.block_until_ready(l)
        ts[n].append((time.perf_counter() - t0) / 3)
for n, v_ in ts.items():
    print(f"{n:12s} min {min(v_)*1e3:7.2f} ms median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

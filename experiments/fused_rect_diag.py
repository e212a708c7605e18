"""Bisect the fused dual-rect attention kernel at the DAT production
shape (256^2, C=180, split (8,16), heads 6): DIAG_LEVELs 0-4, shifted
and unshifted variants.  Standalone compiles are seconds."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
from tpu_superresolution_tpu.ops.window import rect_shift_region_ids

rng = np.random.default_rng(0)
B, H, W, C = 1, 256, 256, 180
S0, S1, NH = 8, 16, 6
nhb = NH // 2
N = S0 * S1
f = lambda *shp: jnp.asarray(rng.standard_normal(shp), jnp.float32)
x = f(B, H, W, C).astype(jnp.bfloat16)
xr0 = jnp.roll(x, (-S0 // 2, -S1 // 2), axis=(1, 2))
xr1 = jnp.roll(x, (-S1 // 2, -S0 // 2), axis=(1, 2))
g1, b1 = f(C), f(C)
wqkv, bqkv = f(C, 3 * C) * 0.05, f(3 * C) * 0.1
wdw, bdw = f(3, 3, 1, C) * 0.1, f(C)
bias0, bias1 = f(nhb, N, N) * 0.01, f(nhb, N, N) * 0.01
m0 = rect_shift_region_ids(H, W, S0, S1, S0 // 2, S1 // 2)
m1 = rect_shift_region_ids(H, W, S1, S0, S1 // 2, S0 // 2)

for shifted in (False, True):
    for level in (0, 1, 2, 3, 4):
        if not shifted and level == 3:
            continue  # masks only exist shifted
        fr.DIAG_LEVEL = level
        t0 = time.time()
        try:
            o = jax.block_until_ready(jax.jit(
                lambda x, xr0, xr1: fr.fused_rect_attention(
                    x, xr0 if shifted else None,
                    xr1 if shifted else None,
                    g1, b1, wqkv, bqkv, wdw, bdw, bias0, bias1,
                    m0 if shifted else None, m1 if shifted else None,
                    S0, S1, NH,
                )
            )(x, xr0, xr1))
            fin = all(bool(jnp.isfinite(t).all()) for t in o)
            print(f"[OK]   shifted={shifted} level={level}  "
                  f"compile {time.time()-t0:.1f}s  finite={fin}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"[FAIL] shifted={shifted} level={level}  "
                  f"{type(e).__name__}: {msg}", flush=True)
fr.DIAG_LEVEL = 4
print("ALL DONE", flush=True)

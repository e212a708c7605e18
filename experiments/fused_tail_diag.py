"""Bisect the fused-DATB-tail Mosaic rejection: compile the kernel
STANDALONE at the production shape at each DIAG_LEVEL (0..3) and both
strip sizes.  Pallas-only compiles are seconds, so this isolates the
rejected construct without the 10-min whole-DAT XLA graph around it."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft

rng = np.random.default_rng(0)
B, H, W, C = 1, 256, 256, 180
HID, HALF = 360, 180
f = lambda *shp: jnp.asarray(rng.standard_normal(shp), jnp.float32)
x, u, w_px = (f(B, H, W, C).astype(jnp.bfloat16) for _ in range(3))
gate = jax.nn.sigmoid(f(B, C))
args = dict(
    sp_w1=f(C, C // 16), sp_b1=f(C // 16), sp_w2=f(C // 16, 1),
    sp_b2=f(1), wproj=f(C, C) * 0.05, bproj=f(C), g2=f(C), b2=f(C),
    wfc1=f(C, HID) * 0.05, bfc1=f(HID), gsg=f(HALF), bsg=f(HALF),
    wdw=f(3, 3, 1, HALF) * 0.1, bdw=f(HALF), wfc2=f(HALF, C) * 0.05,
    bfc2=f(C),
)

# s16 is VMEM-dead (level 2 reject); sweep the dwconv column-shift
# impl at s8 level 3 instead.  Round-5 phase 12: "mxu" (banded-matmul
# shifts) with the f32-accumulator fix — group8 was the mode proven
# dead at 256^2; mxu never compiled cleanly before the fix.
for s, level, dw in (
    (8, 3, "mxu"),
):
    if True:
        ft.STRIP_ROWS = s
        ft.DIAG_LEVEL = level
        ft.DW_COLS = dw
        t0 = time.time()
        try:
            o = jax.block_until_ready(
                jax.jit(
                    lambda x, u, w_px, gate: ft.fused_datb_tail(
                        x, u, w_px, gate, **args
                    )
                )(x, u, w_px, gate)
            )
            print(f"[OK]   s={s} level={level} dw={dw}  compile {time.time()-t0:.1f}s  "
                  f"out finite={bool(jnp.isfinite(o).all())}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"[FAIL] s={s} level={level} dw={dw}  {type(e).__name__}: {msg}",
                  flush=True)
ft.DIAG_LEVEL = 3
ft.STRIP_ROWS = 8
ft.DW_COLS = "mxu"
print("ALL DONE", flush=True)

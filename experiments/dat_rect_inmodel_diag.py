"""In-model bisect of the 256^2 rect-kernel compile crash (phase 13).

fused_rect_diag3: the rect kernel compiles STANDALONE at 256^2 (26.7 s)
with the f32-acc fix.  dat_fused_rect_ab2: the WHOLE-model jit with the
same kernel inside crashes the remote compile helper within minutes
(HTTP 500) — while in-model fusion at the 48^2 eval shapes worked
(dat_fused_eval_check).  This sweep separates kernel-call COUNT from
feature-map SIZE:

  depth1 @256^2   2 fused call sites, full shape
  depth2 @256^2   3 call sites
  full   @192^2   9 call sites, smaller shape
  full   @256^2   9 call sites (the known-fail cell)
  chan   @256^2   0 rect sites, 18 channel-kernel sites (is the new
                  two-phase channel kernel in-model viable at 256^2?)
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr
import tpu_superresolution_tpu.ops.pallas.fused_channel_attn as fc
from tpu_superresolution_tpu.core.config import DATConfig, build_model

rng = np.random.default_rng(0)
ft.FUSED_TAIL = "off"
fr.FUSED_RECT_SHIFTED = "off"

cases = [
    ("depth1@256", dict(depths=(6,), num_heads=(6,)), 256, "on", "off"),
    ("depth2@256", dict(depths=(6, 6), num_heads=(6, 6)), 256, "on", "off"),
    ("full@192", dict(), 192, "on", "off"),
    ("full@256", dict(), 256, "on", "off"),
    ("chan@256", dict(), 256, "off", "on"),
    ("full@256-warm", dict(), 256, "on", "off"),
]
for tag, kw, size, rect, chan in cases:
    if tag.endswith("-warm"):
        # pre-compile the kernel STANDALONE (known-good, diag3) so the
        # in-model Mosaic compiles can hit the helper's payload cache —
        # tests whether the crash is parallel recompilation of the 9
        # identical call sites rather than the kernel itself
        from tpu_superresolution_tpu.ops.window import rect_shift_region_ids
        fr.FUSED_RECT = "on"
        g = lambda *s: jnp.asarray(rng.standard_normal(s), np.float32)
        C = 180
        t0 = time.time()
        try:
            o = jax.block_until_ready(jax.jit(
                lambda xx: fr.fused_rect_attention(
                    xx, None, None, g(C), g(C), g(C, 3 * C) * 0.05,
                    g(3 * C) * 0.1, g(3, 3, 1, C) * 0.1, g(C),
                    g(3, 128, 128) * 0.01, g(3, 128, 128) * 0.01,
                    None, None, 8, 16, 6,
                )
            )(g(1, size, size, C).astype(jnp.bfloat16)))
            print(f"[warm] standalone compile {time.time()-t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"[warm] standalone FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    fr.FUSED_RECT = rect
    fc.FUSED_CHAN = chan
    model = build_model(DATConfig(scale=4, **kw), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, size, size, 3), np.float32))
    v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
    fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
    t0 = time.time()
    try:
        o = jax.block_until_ready(fn(x))
        print(f"[OK]   {tag:12s} compile {time.time()-t0:.0f}s "
              f"finite={bool(jnp.isfinite(o).all())}", flush=True)
    except Exception as e:
        print(f"[FAIL] {tag:12s} after {time.time()-t0:.0f}s "
              f"{type(e).__name__}: {str(e)[:250]}", flush=True)
fr.FUSED_RECT = "off"
fc.FUSED_CHAN = "off"
print("ALL DONE", flush=True)

"""Transparency check at the production tile shape: PSNR between the
module-chain DAT forward and each fused-stack forward at 192^2 (the
proof eval set runs 48^2 LR, which the shifted/tail kernels never see
after the w%64 shift gate).  Acceptance mirrors the tanh-gelu
precedent (CLAUDE.md): delta-PSNR above the ~64 dB bf16 floor means
the impl difference is invisible under bf16 compute.

jaxcache is warm for these exact configs (dat_fused_tail192_ab)."""
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
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, SIZE, SIZE, 3), np.float32))
model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
fc.FUSED_CHAN = "off"

# (tag, chan_impl, rect, rect_shifted, tail) — module baseline first
cases = [
    ("module", "heads", "off", "off", "off"),
    ("tail", "heads", "off", "off", "on"),
    ("blockdiag+tail", "blockdiag", "off", "off", "on"),
    ("bd+rect+sh+tail", "blockdiag", "on", "on", "on"),
]
outs = {}
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
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:800]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    outs[tag] = np.asarray(o, np.float32)
datmod.CHAN_ATTN_IMPL = "heads"
fr.FUSED_RECT = "off"; fr.FUSED_RECT_SHIFTED = "off"; ft.FUSED_TAIL = "off"

base = outs.get("module")
for tag, o in outs.items():
    if tag == "module" or base is None:
        continue
    mse = float(np.mean((o - base) ** 2))
    ps = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    print(f"selfPSNR {tag:16s}: {ps:7.2f} dB  maxdiff {float(np.max(np.abs(o - base))):.2e}",
          flush=True)
print("ALL DONE", flush=True)

"""HAT 256^2 x4 whole-forward A/B: CAB conv impl gemm vs halo with the
strict VMEM gate relaxed.

The strict `_fit_rows` gate (79f21e0) refuses halo at any shape where
the full 32-row pipeline block overflows VMEM, because estimate-shrunk
rows (~10) still crashed the remote Mosaic at 256^2 x C=180 (SwinIR).
HAT's CAB convs are C<=96 (conv1 96->32, conv2 32->96) at 259^2 —
shrunk rows ~21/49 — a different regime the crash evidence does not
cover.  If halo compiles AND wins here, flip CAB(conv_impl=) by shape
class; if Mosaic rejects, [FAIL] is printed and the strict gate stands
for CAB too.

Cells (interleaved min/median of the whole forward):
  gemm        — current default (round-4 80.45 ms class)
  halo-relax  — CAB conv_impl="halo", cab_conv.STRICT=False
  halo+trunk  — same + trunk/input convs also relax strict (the trunk
                halo at 256^2 x C180 crashed before; catch per-case)

Run on the TPU: python experiments/hat_cab_halo_ab.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
import tpu_superresolution_tpu.models.hat as hat_mod
from tpu_superresolution_tpu.core.config import HATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32), jnp.bfloat16)

model = build_model(HATConfig(scale=4), dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), x[:, :64, :64], train=False)["params"]

def mk(cab_impl, relax_trunk):
    @jax.jit
    def fwd(p, xx):
        cc.STRICT = not (cab_impl == "halo" or relax_trunk)
        hat_mod.CAB_CONV_IMPL = cab_impl  # trace-time module global
        return model.apply({"params": p}, xx, train=False)

    return fwd


CASES = [
    ("gemm", mk("gemm", False)),
    ("halo-relax", mk("halo", False)),
]

fns = {}
for tag, fn in CASES:
    t0 = time.time()
    try:
        jax.block_until_ready(fn(params, x))
    except Exception as e:
        print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:1500]}", flush=True)
        continue
    print(f"[compile] {tag}: {time.time()-t0:.0f}s", flush=True)
    fns[tag] = fn
cc.STRICT = True
hat_mod.CAB_CONV_IMPL = "gemm"

ts = {n: [] for n in fns}
for r in range(6):
    for n, fn in fns.items():
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = fn(params, x)
        jax.block_until_ready(out)
        ts[n].append((time.perf_counter() - t0) / 5)
print("\n=== HAT 256^2 x4 whole-forward (ms) ===", flush=True)
for n, v_ in ts.items():
    print(f"{n:12s} min {min(v_)*1e3:7.2f}  median {sorted(v_)[len(v_)//2]*1e3:7.2f}",
          flush=True)
print("RC=0", flush=True)

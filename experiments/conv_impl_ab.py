"""SwinIR-M / DAT whole-forward A/B: trunk Conv3x3 impl gemm vs xla."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.models.blocks as blocks
import tpu_superresolution_tpu.ops.fused_upsample as fu
from tpu_superresolution_tpu.core.config import SwinIRConfig, DATConfig, build_model

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))

xt = jnp.asarray(rng.random((25, 64, 64, 3), np.float32))

for mname, cfg in (("swinir", SwinIRConfig(scale=4)),
                   ("swinir_b25t64", SwinIRConfig(scale=4))):
    model = build_model(cfg, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
    xin = xt if mname == "swinir_b25t64" else x
    fns, outs = {}, {}
    # Trimmed round-4 (compiles ~4x slower today): the decisive three
    # at both shapes; gemm+first / halo+up re-enter behind the winner.
    tags = ("gemm", "xla", "halo")
    for tag in tags:
        blocks.CONV3X3_IMPL = {"gemm+first": "gemm", "halo+up": "halo"}.get(tag, tag)
        blocks.CONV3X3_INPUT_IMPL = "gemm" if tag == "gemm+first" else "xla"
        fu.CONV_IMPL = "halo" if tag == "halo+up" else "xla"
        fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
        t0 = time.time()
        try:
            o = jax.block_until_ready(fn(xin))
        except Exception as e:
            print(f"[FAIL] {mname}/{tag}: {type(e).__name__}: {str(e)[:4000]}",
                  flush=True)
            continue
        print(f"[compile] {mname}/{tag}: {time.time()-t0:.0f}s", flush=True)
        fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
    blocks.CONV3X3_IMPL = "gemm"
    blocks.CONV3X3_INPUT_IMPL = "xla"
    if "gemm" in outs and "xla" in outs:
        print(f"{mname} maxdiff gemm vs xla: "
              f"{float(np.max(np.abs(outs['gemm'] - outs['xla']))):.2e}",
              flush=True)
    ts = {n: [] for n in fns}
    for r in range(6):
        for n, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn(xin)
            jax.block_until_ready(o)
            ts[n].append((time.perf_counter() - t0) / 3)
    for n, v_ in ts.items():
        print(f"{mname}/{n:5s} min {min(v_)*1e3:7.2f} ms "
              f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

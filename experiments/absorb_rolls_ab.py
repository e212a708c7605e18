"""SwinIR-M whole-forward A/B: roll-absorbing megakernel reads
(fused_block.ABSORB_ROLLS) vs the roll-based production path, at 256^2
and the bench shape (b=25 tile-64).  Rolls measured ~2.5 ms of the
37.1 ms 256^2 forward (PARITY.md); absorption trades them for neighbor
strip reads + a VMEM sublane relayout.  Risk: Mosaic may reject the
ws-sublane concat+offset-slice — [FAIL] is caught and printed."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_block as fb
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

rng = np.random.default_rng(0)
x256 = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
xt = jnp.asarray(rng.random((25, 64, 64, 3), np.float32))

model = build_model(SwinIRConfig(scale=4), dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x256[:, :64, :64], train=False)

for shape_tag, xin in (("256x256", x256), ("b25t64", xt)):
    fns, outs = {}, {}
    # b25t64 additionally A/Bs the odd-batch fold SPLIT (24 folded + 1
    # tail, session-2 code, unmeasured — engages at the bench's b=25 by
    # default) against no folding.
    cases = [("rolls", False, True), ("absorb", True, True)]
    if shape_tag == "b25t64":
        cases.append(("rolls+nofold", False, False))
        cases.append(("absorb+nofold", True, False))
    for tag, absorb, fold in cases:
        fb.ABSORB_ROLLS = absorb
        fb.ALLOW_FOLD = fold
        fn = jax.jit(lambda b, model=model, v=v: model.apply(v, b, train=False))
        t0 = time.time()
        try:
            o = jax.block_until_ready(fn(xin))
        except Exception as e:
            print(f"[FAIL] {shape_tag}/{tag}: {type(e).__name__}: "
                  f"{str(e)[:4000]}", flush=True)
            continue
        print(f"[compile] {shape_tag}/{tag}: {time.time()-t0:.0f}s", flush=True)
        fns[tag] = fn; outs[tag] = np.asarray(o, np.float32)
    fb.ABSORB_ROLLS = False
    fb.ALLOW_FOLD = True
    if "rolls" in outs and "absorb" in outs:
        print(f"{shape_tag} maxdiff: "
              f"{float(np.max(np.abs(outs['absorb'] - outs['rolls']))):.2e}",
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
        print(f"{shape_tag}/{n:7s} min {min(v_)*1e3:7.2f} ms "
              f"median {sorted(v_)[len(v_)//2]*1e3:7.2f} ms", flush=True)
print("RC=0", flush=True)

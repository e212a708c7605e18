"""Validate the CONV3X3_IMPL="halo" default flip at the VMEM-squeezed
shape: SwinIR-M 256^2 whole-forward with PRODUCTION defaults must
compile (strict _fit_rows routes every 256^2 conv back to the XLA op)
and time in the ~45-46.5 ms class measured for conv=xla
(conv_halo_flip_ab / conv_impl_ab).  A Mosaic crash here means the
strict gate failed and the flip must be reverted.

Run on the TPU: python experiments/halo_flip_validate.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.models import blocks
from tpu_superresolution_tpu.ops import fused_upsample

print("CONV3X3_IMPL:", blocks.CONV3X3_IMPL,
      "INPUT:", blocks.CONV3X3_INPUT_IMPL,
      "UP:", fused_upsample.CONV_IMPL, flush=True)

model = build_model(SwinIRConfig(scale=4), dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
variables = model.init(jax.random.key(0), x[:, :64, :64, :], train=False)

fwd = jax.jit(lambda img: model.apply(variables, img, train=False))
t0 = time.time()
out = jax.block_until_ready(fwd(x))
print(f"[compile] 256^2 production defaults: {time.time()-t0:.0f}s", flush=True)
assert bool(jnp.isfinite(out).all())

times = []
for _ in range(6):
    t0 = time.perf_counter()
    for _ in range(3):
        out = fwd(x)
    jax.block_until_ready(out)
    times.append((time.perf_counter() - t0) / 3)
ms = sorted(t * 1e3 for t in times)
print(f"256^2 halo-default  min {ms[0]:7.2f} ms  median {ms[len(ms)//2]:7.2f} ms")
print("RC=0")

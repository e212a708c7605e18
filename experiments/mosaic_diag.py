"""Diagnose the four Mosaic compile failures from the round-4 queue
(hat_spatial_matrix / conv_impl_ab / dat_impl_matrix truncated their
errors to 300 chars, hiding the server-side detail).  hat_train_split
showed at least one 'rejection' was actually a scoped-VMEM stack OOM
(16.54M vs 16M — fixed by PACKED_GROUP_BWD=8); this prints the full
error per case so each failure is classified fixable-OOM vs genuine
lowering rejection.  Failures are fast (~1 min, Mosaic dies before the
big XLA compile), so the whole sweep is cheap.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

import tpu_superresolution_tpu.ops.pallas.fused_block as fb
import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
import tpu_superresolution_tpu.models.blocks as blocks
import tpu_superresolution_tpu.models.dat as datm
from tpu_superresolution_tpu.core.config import (
    HATConfig, SwinIRConfig, DATConfig, build_model,
)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))


def attempt(tag, build, xin):
    t0 = time.time()
    try:
        fn, v, model = build()
        o = jax.block_until_ready(
            jax.jit(lambda b: model.apply(v, b, train=False))(xin))
        print(f"[OK] {tag}: compiled+ran in {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        msg = str(e)
        kind = "VMEM-OOM" if "vmem" in msg.lower() else (
            "MOSAIC" if "mosaic" in msg.lower() or "tpu_compile_helper" in msg
            else "OTHER")
        print(f"[FAIL:{kind}] {tag} after {time.time()-t0:.0f}s", flush=True)
        print(msg[:4000], flush=True)
        print("-" * 72, flush=True)


def hat_case(tag, **flags):
    def build():
        for k, val in flags.items():
            mod, attr = k.split(".")
            setattr({"fb": fb, "cc": cc, "blocks": blocks}[mod], attr, val)
        model = build_model(HATConfig(scale=4), dtype=jnp.bfloat16)
        v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
        return None, v, model
    attempt(tag, build, x)
    fb.SPATIAL_PACKED = False
    cc.ENABLE = False
    blocks.CONV3X3_IMPL = "xla"


hat_case("hat spatial/v3", **{"fb.SPATIAL_PACKED": True})
hat_case("hat classic+fusedCAB", **{"cc.ENABLE": True})


def swinir_halo():
    blocks.CONV3X3_IMPL = "halo"
    model = build_model(SwinIRConfig(scale=4), dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
    return None, v, model


attempt("swinir conv3x3 halo @256^2", swinir_halo, x)
blocks.CONV3X3_IMPL = "xla"


def dat_dwhalo():
    blocks.DWCONV3X3_IMPL = "halo"
    model = build_model(DATConfig(scale=4), dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), x[:, :64, :64], train=False)
    return None, v, model


attempt("dat dwconv3x3 halo @256^2", dat_dwhalo, x)
blocks.DWCONV3X3_IMPL = "xla"
print("RC=0", flush=True)

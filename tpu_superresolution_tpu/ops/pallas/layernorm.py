"""Standalone Pallas LayerNorm for the XLA-side feeds of the fused
blocks.

XLA's layernorm at HAT's in-model shape ([1, 259, 259, 96] bf16) costs
~0.68 ms regardless of precision (fp32 `_ln`, mixed-stats, and flax
bf16 all measured within noise on v5e — PARITY.md round 3), ~20x its
HBM roofline; the reduce-over-96-lanes lowering just doesn't fuse
well.  The megakernels compute the same LN nearly free in VMEM, so the
few places that still need a SPATIAL-domain LayerNorm outside a kernel
(HAT's CAB feed and OCAB's qkv feed, models/hat.py; reference
hat_arch.py:287,399) use this one-pass kernel instead: bf16 loads,
fp32 row statistics (flax fast-variance formula, matching
fused_block._ln and nn.LayerNorm), output in x.dtype.

Rows are independent, so the grid tiles a flattened [T, C] view with a
masked tail block (out-of-range lanes of the final block compute
garbage that is never written back).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln_kernel(x_ref, g_ref, b_ref, o_ref):
    x32 = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + _EPS) * g_ref[:] + b_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def pallas_layernorm(x, scale, bias, interpret=None, block_rows=2048):
    """LayerNorm over the last axis of x (any leading shape), fp32
    stats, output in x.dtype.  scale/bias: [C] (any float dtype)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    c = shape[-1]
    t = 1
    for d in shape[:-1]:
        t *= d
    x2 = x.reshape(t, c)
    grid = (pl.cdiv(t, block_rows),)
    out = pl.pallas_call(
        _ln_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        interpret=interpret,
    )(
        x2,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )
    return out.reshape(shape)


def layernorm_spatial(x, scale, bias, interpret=None):
    """Drop-in for `_ln(x.astype(f32), g, b).astype(dt)` on spatial
    maps: Pallas on TPU, the jnp formula elsewhere (grad support rides
    jax.vjp of the jnp path via custom_vjp).  Small inputs stay on the
    jnp formula even on TPU — below ~4k rows the kernel-launch cost
    exceeds any HBM saving and a separate Pallas call blocks XLA from
    fusing the neighbours."""
    from tpu_superresolution_tpu.ops.pallas.fused_block import _ln

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if interpret or rows < 4096:
        return _ln(x.astype(jnp.float32), scale, bias).astype(x.dtype)

    @jax.custom_vjp
    def op(x, scale, bias):
        return pallas_layernorm(x, scale, bias, interpret=False)

    def fwd(x, scale, bias):
        return op(x, scale, bias), (x, scale, bias)

    def bwd(res, ct):
        x, scale, bias = res
        _, vjp = jax.vjp(
            lambda xx, g, b: _ln(xx.astype(jnp.float32), g, b).astype(x.dtype),
            x, scale, bias,
        )
        return vjp(ct)

    op.defvjp(fwd, bwd)
    return op(x, scale, bias)

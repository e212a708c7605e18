"""Fused window-attention Pallas TPU kernel.

Why: in the pure-jnp path, adding the relative-position bias (and shift
mask) between the QK^T and AV matmuls breaks XLA's attention fusion and
materializes the [B*nW, nH, N, N] attention tensor in HBM — measured at
~1.8 ms/block for SwinIR-M on a 256x256 input (~70% of the whole
forward).  This kernel keeps the per-window attention matrix in VMEM:
one grid step per window loads q/k/v tiles, computes per-head
QK^T (+bias +mask) -> fp32 softmax -> AV entirely on-chip, and writes
only the [N, C] output — HBM traffic drops to the q/k/v/o tiles.

Covers SwinIR's W-MSA (ops target #1 of SURVEY.md §2.5,
network_swinir.py:114-145) and HAT's HAB attention (hat_arch.py:166-197)
— same math, shared here.

Layout contract (caller prepares):
  q, k, v: [B*nW, nH, N, hd]   (window-major, head, token, head-dim)
  bias:    [nH, N, N] fp32     (already gathered from the RPB table)
  mask:    [nW_mask, N, N] fp32 or None; window w uses mask[w % nW_mask]
  returns  [B*nW, nH, N, hd]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, num_heads, scale):
    # block shapes: q/k/v/o [1, nH, N, hd]; bias [nH, N, N]; mask [1, N, N]
    m = mask_ref[0] if mask_ref is not None else None
    for h in range(num_heads):
        q = q_ref[0, h].astype(jnp.float32) * scale  # [N, hd]
        k = k_ref[0, h].astype(jnp.float32)
        attn = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [N, N]
        attn = attn + bias_ref[h]
        if m is not None:
            attn = attn + m
        attn = jax.nn.softmax(attn, axis=-1)
        v = v_ref[0, h].astype(jnp.float32)
        o = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """See module docstring for the layout contract."""
    bw, nh, n, hd = q.shape
    bias = bias.astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((1, nh, n, hd), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh, n, hd), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh, n, hd), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, n, n), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias]
    if mask is not None:
        nwm = mask.shape[0]
        in_specs.append(
            pl.BlockSpec((1, n, n), lambda g: (g % nwm, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(_kernel, num_heads=nh, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, br, orf, **kw: _kernel(qr, kr, vr, br, None, orf, **kw),
            num_heads=nh,
            scale=scale,
        )

    return pl.pallas_call(
        kernel,
        grid=(bw,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nh, n, hd), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, nh, n, hd), q.dtype),
        interpret=interpret,
    )(*args)


def window_attention_reference(q, k, v, bias, mask=None, scale=1.0):
    """Pure-jnp reference with identical semantics (parity oracle)."""
    attn = jnp.einsum(
        "whqd,whkd->whqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        nwm = mask.shape[0]
        bw = q.shape[0]
        midx = jnp.arange(bw) % nwm
        attn = attn + mask.astype(jnp.float32)[midx][:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whqk,whkd->whqd", attn, v.astype(jnp.float32))
    return out.astype(q.dtype)

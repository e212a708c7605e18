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
  q:       [B*nW, nH, Nq, hd]  (window-major, head, token, head-dim)
  k, v:    [B*nW, nH, Nk, hd]  (Nk may differ from Nq — HAT's OCAB
                                cross-attends ws^2 queries to ows^2 keys,
                                hat_arch.py:393-429)
  bias:    [nH, Nq, Nk] fp32   (already gathered from the RPB table)
  mask:    [nW_mask, Nq, Nk] fp32 or None; window w uses mask[w % nW_mask]
  returns  [B*nW, nH, Nq, hd]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, num_heads, scale):
    # block shapes: q/k/v/o [G, nH, Nq/Nk, hd]; bias [nH, Nq, Nk];
    # mask [G, Nq, Nk] (or None)
    g_windows = q_ref.shape[0]
    for g in range(g_windows):
        m = mask_ref[g] if mask_ref is not None else None
        for h in range(num_heads):
            q = q_ref[g, h].astype(jnp.float32) * scale  # [Nq, hd]
            k = k_ref[g, h].astype(jnp.float32)
            attn = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [Nq, Nk]
            attn = attn + bias_ref[h]
            if m is not None:
                attn = attn + m
            attn = jax.nn.softmax(attn, axis=-1)
            v = v_ref[g, h].astype(jnp.float32)
            o = jax.lax.dot_general(
                attn, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[g, h] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "windows_per_block")
)
def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    interpret: bool = False,
    windows_per_block: int = 8,
) -> jnp.ndarray:
    """See module docstring for the layout contract.

    `windows_per_block` amortizes grid/DMA overhead across several
    windows per kernel invocation; it must divide B*nW (auto-reduced to
    the largest divisor otherwise).  When a mask is present it must also
    divide nW_mask (or nW_mask must divide it cleanly in repetition —
    the kernel block pulls `g % (nwm // G)`-style aligned slices), so we
    additionally require G | nwm.
    """
    bw, nh, nq, hd = q.shape
    nk = k.shape[2]
    bias = bias.astype(jnp.float32)

    g = max(1, windows_per_block)
    while bw % g or (mask is not None and mask.shape[0] % g):
        g -= 1

    in_specs = [
        pl.BlockSpec((g, nh, nq, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, nh, nk, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, nh, nk, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, nq, nk), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias]
    if mask is not None:
        nwm_blocks = mask.shape[0] // g
        in_specs.append(
            pl.BlockSpec(
                (g, nq, nk), lambda i: (i % nwm_blocks, 0, 0), memory_space=pltpu.VMEM
            )
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
        grid=(bw // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (g, nh, nq, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, nh, nq, hd), q.dtype),
        interpret=interpret,
    )(*args)


def resolve_attention_impl(impl: str = "auto") -> str:
    """'auto' -> 'pallas' on TPU hardware, 'jnp' elsewhere (CPU tests,
    virtual meshes)."""
    if impl != "auto":
        return impl
    import jax

    try:
        d = jax.devices()[0]
        if d.platform == "tpu" or "TPU" in getattr(d, "device_kind", ""):
            return "pallas"
    except Exception:  # pragma: no cover
        pass
    return "jnp"


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

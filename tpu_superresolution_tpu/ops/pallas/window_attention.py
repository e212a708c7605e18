"""Fused window-attention Pallas TPU kernel.

Why: XLA fuses plain softmax(QK^T)V window attention into a nearly-free
on-chip program, but ANY additive relative-position bias or shift mask
between QK^T and the softmax breaks the fusion and materializes the
[B*nW, nH, N, N] attention tensor in HBM — measured ~3 ms per SwinIR-M
block on a 256x256 input (~2/3 of the whole forward).  Every standard
workaround (bf16-uniform adds, k-augmentation, flat dot_general) was
measured and none restores the fusion.

Kernel design ("window packing"): per-window attention matrices are
tiny ([64, 64] with head_dim 30 — ~12% MXU utilization), so the kernel
packs P windows into ONE [P*N, P*N] attention tile per head:

  S = (Qs * scale) @ Ks^T          # [P*N, hd] @ [hd, P*N] — MXU-dense
  S += biasdiag[h]                 # RPB tiled on the diagonal blocks,
                                   # -1e9 off-diagonal (cross-window
                                   # logits vanish under softmax)
  S += shift mask per diag block   # optional, [N, N] per window
  S = softmax(S)                   # off-diag -> exp(-1e9) = 0 exactly
  O = S @ Vs                       # [P*N, P*N] @ [P*N, hd]

The P x waste in FLOPs buys full 128-lane tiles; everything stays in
VMEM, HBM traffic is just the q/k/v/o tiles.  Covers SwinIR W-MSA
(network_swinir.py:114-145), HAT HAB (hat_arch.py:166-197), and HAT
OCAB (asymmetric Nq/Nk, packed with rectangular diagonal blocks).

Layout contract (caller prepares):
  q:       [B*nW, nH, Nq, hd]
  k, v:    [B*nW, nH, Nk, hd]
  bias:    [nH, Nq, Nk] fp32    (gathered from the RPB table)
  mask:    [nW_mask, Nq, Nk] fp32 or None; window w uses mask[w % nW_mask]
  returns  [B*nW, nH, Nq, hd]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, biasdiag_ref, mask_ref, o_ref, *, num_heads, scale):
    # blocks: q [P, nH, Nq, hd]; k/v [P, nH, Nk, hd];
    # biasdiag [nH, P*Nq, P*Nk]; maskdiag [1, P*Nq, P*Nk] or None
    p, nh, nq, hd = q_ref.shape
    nk = k_ref.shape[2]
    for h in range(num_heads):
        qs = q_ref[:, h].reshape(p * nq, hd).astype(jnp.float32) * scale
        ks = k_ref[:, h].reshape(p * nk, hd).astype(jnp.float32)
        s = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [P*Nq, P*Nk]
        s = s + biasdiag_ref[h]
        if mask_ref is not None:
            s = s + mask_ref[0]
        s = jax.nn.softmax(s, axis=-1)
        vs = v_ref[:, h].reshape(p * nk, hd).astype(jnp.float32)
        o = jax.lax.dot_general(
            s, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [P*Nq, hd]
        o_ref[:, h] = o.reshape(p, nq, hd).astype(o_ref.dtype)


def _build_biasdiag(bias: jnp.ndarray, p: int) -> jnp.ndarray:
    """[nH, Nq, Nk] -> [nH, P*Nq, P*Nk]: bias tiled on the diagonal
    blocks, -1e9 elsewhere (suppresses cross-window attention)."""
    nh, nq, nk = bias.shape
    out = jnp.full((nh, p * nq, p * nk), _NEG, jnp.float32)
    b = bias.astype(jnp.float32)
    for i in range(p):
        out = jax.lax.dynamic_update_slice(out, b, (0, i * nq, i * nk))
    return out


def _build_maskdiag(mask: jnp.ndarray, p: int) -> jnp.ndarray:
    """[nWm, Nq, Nk] -> [nWm/P, P*Nq, P*Nk]: block b's diagonal holds the
    shift masks of windows [b*P, b*P+P); zeros elsewhere (the -1e9
    off-diagonal term lives in the biasdiag)."""
    nwm, nq, nk = mask.shape
    nb = nwm // p
    out = jnp.zeros((nb, p * nq, p * nk), jnp.float32)
    m = mask.astype(jnp.float32)
    for b in range(nb):
        for i in range(p):
            out = jax.lax.dynamic_update_slice(
                out, m[b * p + i][None], (b, i * nq, i * nk)
            )
    return out


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
    interpret: Optional[bool] = None,
    windows_per_block: int = 8,
) -> jnp.ndarray:
    """See module docstring for the layout contract.

    `windows_per_block` (P) is auto-reduced to the largest value that
    divides B*nW (and nW_mask when masked) and keeps the packed
    attention tile + operands within a VMEM budget.  `interpret=None`
    auto-selects Pallas interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bw, nh, nq, hd = q.shape
    nk = k.shape[2]

    # Mosaic collapses [P, Nq, hd] -> [P*Nq, hd] in-kernel, needing the
    # token dims sublane-aligned; HAT's ws=7 gives Nq=49 (and OCAB
    # Nk=121).  Pad tokens to multiples of 8: pad KEY columns get -1e9
    # bias (zero softmax weight), pad QUERY rows produce garbage that is
    # sliced off.  Semantics (hat_arch.py:130-197,393-439) unchanged.
    nq_orig = nq
    qpad, kpad = (-nq) % 8, (-nk) % 8
    if qpad or kpad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, qpad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, kpad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, kpad), (0, 0)))
        bias = jnp.pad(
            bias, ((0, 0), (0, qpad), (0, kpad)), constant_values=_NEG
        )
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, qpad), (0, kpad)))
        nq, nk = nq + qpad, nk + kpad

    # When unmasked, also pad the window-count dim to a multiple of 8 so
    # the packing loop never degrades to p=1 on prime window counts
    # (OCAB at 259x259 has 37^2=1369 windows).  Dead windows are zero
    # tokens; their outputs are sliced off.  Masked calls must be padded
    # by the caller (per-image mask phase must stay aligned).
    bw_orig = bw
    bwpad = (-bw) % 8 if mask is None else 0
    if bwpad:
        q = jnp.pad(q, ((0, bwpad), (0, 0), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, bwpad), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, bwpad), (0, 0), (0, 0), (0, 0)))
        bw += bwpad

    p = max(1, windows_per_block)
    def _vmem_ok(p):
        qkv = 3 * p * nh * max(nq, nk) * max(hd, 128) * 2  # lane-padded bf16-ish
        tile = p * nq * p * nk * 4 * 2  # S + biasdiag slices
        return qkv + nh * p * nq * p * nk * 4 + tile < 12 * 1024 * 1024
    while p > 1 and (bw % p or (mask is not None and mask.shape[0] % p) or not _vmem_ok(p)):
        p -= 1

    biasdiag = _build_biasdiag(bias, p)

    in_specs = [
        pl.BlockSpec((p, nh, nq, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p, nh, nk, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p, nh, nk, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (nh, p * nq, p * nk), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [q, k, v, biasdiag]
    if mask is not None:
        maskdiag = _build_maskdiag(mask, p)
        nwm_blocks = maskdiag.shape[0]
        in_specs.append(
            pl.BlockSpec(
                (1, p * nq, p * nk),
                lambda i: (i % nwm_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(maskdiag)
        kernel = functools.partial(_kernel, num_heads=nh, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, br, orf, **kw: _kernel(qr, kr, vr, br, None, orf, **kw),
            num_heads=nh,
            scale=scale,
        )

    out = pl.pallas_call(
        kernel,
        grid=(bw // p,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (p, nh, nq, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, nh, nq, hd), q.dtype),
        interpret=interpret,
    )(*args)
    if bwpad:
        out = out[:bw_orig]
    if nq != nq_orig:
        out = out[:, :, :nq_orig, :]
    return out


def resolve_attention_impl(impl: str = "auto") -> str:
    """Resolve the attention implementation.

    'auto' resolves to 'fused' on TPU — the fully-fused qkv+attention+
    proj kernel (ops/pallas/fused_attention.py), measured (round 2,
    v5e, on-device chained timing) 74 vs 92 ms SwinIR-M body at 256x256
    bf16 and 7.32 vs 5.86 MPix/s on the tiled x4 bench — and 'jnp'
    elsewhere (CPU tests / virtual multi-chip mesh, where Mosaic can't
    compile; the kernel's interpret mode covers CPU when selected
    explicitly).  The round-1 window-packing kernel ('pallas',
    ~2.8 ms/block vs XLA's 1.4) remains selectable for comparison.
    """
    if impl != "auto":
        return impl
    import jax

    return "fused" if jax.default_backend() == "tpu" else "jnp"


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


def _batched_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, num_heads, scale):
    """Per-window BATCHED attention: blocks q/k/v [G, nH, N, hd]; scores
    are G independent [N, N] blocks per head — no block-diagonal packing
    (for large windows, e.g. DAT's N=128, packing wastes (P-1)/P of the
    MXU FLOPs on -1e9 entries; batching wastes none)."""
    mask_ref = rest[0] if len(rest) == 2 else None
    o_ref = rest[-1]
    g, nh, n, hd = q_ref.shape
    ss = []
    for h in range(num_heads):
        q = q_ref[:, h].astype(jnp.float32) * scale
        k = k_ref[:, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, N, N]
        ss.append(s + bias_ref[h][None])
    S = jnp.stack(ss)  # [nH, G, N, N]
    if mask_ref is not None:
        S = S + mask_ref[:][None]
    m = jnp.max(S, axis=-1, keepdims=True)
    E = jnp.exp(S - m)
    A = E / jnp.sum(E, axis=-1, keepdims=True)
    for h in range(num_heads):
        v = v_ref[:, h].astype(jnp.float32)
        o = jax.lax.dot_general(
            A[h], v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, h] = o.astype(o_ref.dtype)


def batched_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    interpret: Optional[bool] = None,
    group: int = 8,
) -> jnp.ndarray:
    """Same layout contract as fused_window_attention (q [B*nW, nH, N,
    hd], bias [nH, N, N], mask [nW, N, N] or None) but without window
    packing — right for LARGE windows (DAT's rect windows, N=128).
    N must be a multiple of 8; the window count is padded to `group`
    internally (mask phase preserved when nW % group == 0).

    Differentiable: custom_vjp whose backward is jax.vjp over
    window_attention_reference (DAT attention_impl='pallas' under
    jax.grad works; the jnp path is DAT's measured-best anyway)."""

    @jax.custom_vjp
    def op(q, k, v, bias):
        return _batched_forward(q, k, v, bias, mask, scale, interpret, group)

    def op_fwd(q, k, v, bias):
        return op(q, k, v, bias), (q, k, v, bias)

    def op_bwd(res, ct):
        _, vjp = jax.vjp(
            lambda *a: window_attention_reference(*a, mask=mask, scale=scale),
            *res,
        )
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(q, k, v, bias)


def _batched_forward(q, k, v, bias, mask, scale, interpret, group):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bw, nh, n, hd = q.shape
    assert n % 8 == 0, n
    bw_orig = bw
    bwpad = (-bw) % group
    if bwpad:
        if mask is not None:
            # keep the mask stream aligned: caller guarantees nW % group
            # == 0 when masked (DAT's rect grids are powers of two)
            raise ValueError("masked calls require bw % group == 0")
        q = jnp.pad(q, ((0, bwpad), (0, 0), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, bwpad), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, bwpad), (0, 0), (0, 0), (0, 0)))
        bw += bwpad

    in_specs = [
        pl.BlockSpec((group, nh, n, hd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, nh, n, hd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, nh, n, hd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias.astype(jnp.float32)]
    if mask is not None:
        nwm = mask.shape[0]
        nblocks = nwm // group
        in_specs.append(
            pl.BlockSpec((group, n, n), lambda i: (i % nblocks, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(mask, jnp.float32))
    kernel = functools.partial(_batched_kernel, num_heads=nh, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(bw // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, nh, n, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, nh, n, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:bw_orig] if bwpad else out

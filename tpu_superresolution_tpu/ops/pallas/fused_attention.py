"""Fully-fused window attention: qkv projection + biased/masked softmax
attention + output projection in ONE Pallas TPU kernel.

Why a THIRD structure (round-1 tried five, all lost to XLA's einsum —
see PARITY.md): every earlier kernel consumed the pre-split
[B*nW, nH, N, hd=30] tensors, so by the time the kernel ran the damage
was done — the 30-lane head dim forces a 128-lane-padded HBM layout
(4.3x wasted bandwidth on q/k/v/o), and the qkv/proj GEMMs still ran as
separate XLA ops with their own HBM round trips.  This kernel instead
consumes the WINDOWED FEATURE tensor [B*nW, N, C] (C=180 — lane-dense)
and the raw projection weights, so per transformer block the only HBM
traffic is: x in, out out, weights (resident).  Everything else — the
qkv GEMM, per-head S = QK^T, the relative-position bias add, the
shifted-window mask add (a separate 14 ms/forward in the XLA path), the
fp32 softmax, P@V, the head concat, and the output GEMM — happens in
VMEM on MXU/VPU.

Head-dim padding: hd=30 is padded to hdp=32 INSIDE the weights at trace
time (zero columns in w_qkv, zero rows in w_proj), so all in-kernel lane
slices sit at 32-lane offsets and the padding costs 6% FLOPs instead of
327% bandwidth.  The q part of w_qkv is pre-scaled by hd^-0.5 so the
kernel never multiplies by the attention scale.

Window packing: P windows are packed into one [P*N, P*N] attention tile
per head (full 128-lane registers for N=64, P=2); cross-window logits
are killed by -1e9 baked into the streamed mask tile.  The RPB bias
tile (head-dependent, step-independent) stays VMEM-resident; the mask
tile (head-independent, step-dependent) streams one [P*N, P*N] block
per grid step.

Covers SwinIR W-MSA (reference modules/network_swinir.py:114-145 with
the mask add :132-138) and HAT HAB (hat_arch.py:166-197).

Backward: jax.custom_vjp with the mathematically-identical jnp
reference implementation (training gradients don't pay the kernel a
second engineering cost; inference is the perf target).
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


def _pick_pack(n_windows_total: int, n_mask_windows: Optional[int], n: int) -> int:
    """Largest P in {4, 2, 1} such that groups of P consecutive windows
    divide the batch and never straddle an image's mask period, and the
    packed tile P*N stays <= 512."""
    for p in (4, 2, 1):
        if p * n > 512:
            continue
        if n_windows_total % p:
            continue
        if n_mask_windows is not None and n_mask_windows % p:
            continue
        return p
    return 1


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, rpb_ref, mask_ref,
            o_ref, *, num_heads, hdp, p, n, c, cdt):
    pn = p * n
    xb = x_ref[:].reshape(pn, c)
    qkv = jax.lax.dot_general(
        xb, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[:]).astype(cdt)  # [PN, 3*nH*hdp]

    koff = num_heads * hdp
    voff = 2 * koff
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * hdp : (h + 1) * hdp]
        k = qkv[:, koff + h * hdp : koff + (h + 1) * hdp]
        v = qkv[:, voff + h * hdp : voff + (h + 1) * hdp]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [PN, PN]; scale is pre-folded into the q weights
        s = s + rpb_ref[h] + mask_ref[0]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        sm = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        o = jax.lax.dot_general(
            sm, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [PN, hdp]
        outs.append(o.astype(cdt))
    o_cat = jnp.concatenate(outs, axis=-1)  # [PN, nH*hdp]
    out = jax.lax.dot_general(
        o_cat, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bproj_ref[:]
    o_ref[:] = out.astype(o_ref.dtype).reshape(p, n, c)


def _prep_weights(wqkv, bqkv, wproj, bproj, num_heads, scale):
    """Rearrange raw Dense weights into the kernel layout.

    wqkv [C, 3C] -> [C, 3*nH*hdp] with each head's hd zero-padded to hdp
    and the q part pre-scaled; bqkv [3C] -> [1, 3*nH*hdp] likewise.
    wproj [C, C] -> [nH*hdp, C] with zero rows at pad positions.
    All trace-time jnp ops — XLA folds them once per compile.
    """
    # Checkpoint-restored params arrive as host numpy (train/checkpoint.py
    # forces leaves to numpy for backend portability) — the .at[] updates
    # below are jnp-only, so coerce here.  Under jit this traces to the
    # same constant-folded graph either way.
    wqkv = jnp.asarray(wqkv)
    wproj = jnp.asarray(wproj)
    if bqkv is not None:
        bqkv = jnp.asarray(bqkv)
    bproj = jnp.asarray(bproj)

    c = wqkv.shape[0]
    hd = c // num_heads
    hdp = ((hd + 31) // 32) * 32
    pad = hdp - hd

    w = wqkv.reshape(c, 3, num_heads, hd)
    w = w.at[:, 0].multiply(scale)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad)))
    w = w.reshape(c, 3 * num_heads * hdp)

    if bqkv is None:
        b = jnp.zeros((3 * num_heads * hdp,), jnp.float32)
    else:
        b = bqkv.reshape(3, num_heads, hd).astype(jnp.float32)
        b = b.at[0].multiply(scale)
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad))).reshape(-1)
    b = b.reshape(1, -1)

    wp = wproj.reshape(num_heads, hd, c)
    wp = jnp.pad(wp, ((0, 0), (0, pad), (0, 0))).reshape(num_heads * hdp, c)
    bp = bproj.reshape(1, c).astype(jnp.float32)
    return w, b, wp, bp, hdp


def _build_rpb_diag(bias: jnp.ndarray, p: int) -> jnp.ndarray:
    """[nH, N, N] -> [nH, P*N, P*N]: per-head RPB tiled on the diagonal
    blocks, 0 elsewhere (the -1e9 off-diagonal lives in the mask tile)."""
    nh, n, _ = bias.shape
    if p == 1:
        return bias.astype(jnp.float32)
    eye = np.kron(np.eye(p, dtype=np.float32), np.ones((n, n), np.float32))
    big = jnp.tile(bias.astype(jnp.float32), (1, p, p))
    return big * jnp.asarray(eye)[None]


def _build_mask_diag(mask: Optional[np.ndarray], nwm: Optional[int],
                     p: int, n: int) -> np.ndarray:
    """Streamed [G, P*N, P*N] tile: shift mask on the diagonal blocks,
    -1e9 off-diagonal.  G = nwm/P for masked blocks, 1 otherwise.
    Numpy trace-time constant."""
    pn = p * n
    off = _NEG * (1.0 - np.kron(np.eye(p, dtype=np.float32),
                                np.ones((n, n), np.float32)))
    if mask is None:
        return off[None]
    g = nwm // p
    out = np.tile(off[None], (g, 1, 1))
    m = np.asarray(mask, np.float32)
    for b in range(g):
        for i in range(p):
            out[b, i * n : (i + 1) * n, i * n : (i + 1) * n] += m[b * p + i]
    return out


def _reference_impl(xw, wqkv, bqkv, wproj, bproj, bias, mask, scale):
    """Pure-jnp forward with identical semantics — the custom_vjp
    backward and the parity oracle."""
    bw, n, c = xw.shape
    nh = bias.shape[0]
    hd = c // nh
    qkv = xw @ wqkv.astype(xw.dtype)
    if bqkv is not None:
        qkv = qkv + bqkv.astype(xw.dtype)
    qkv = qkv.reshape(bw, n, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum(
        "wqhd,wkhd->whqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        nwm = mask.shape[0]
        midx = np.arange(bw) % nwm
        attn = attn + jnp.asarray(mask, jnp.float32)[midx][:, None]
    attn = jax.nn.softmax(attn, axis=-1).astype(xw.dtype)
    out = jnp.einsum("whqk,wkhd->wqhd", attn, v.astype(xw.dtype))
    out = out.reshape(bw, n, c)
    out = out @ wproj.astype(xw.dtype) + bproj.astype(xw.dtype)
    return out


def _fused_forward(xw, wqkv, bqkv, wproj, bproj, bias, mask, scale, interpret):
    bw, n, c = xw.shape
    nh = bias.shape[0]
    nwm = None if mask is None else int(mask.shape[0])
    p = _pick_pack(bw, nwm, n)

    w, b, wp, bp, hdp = _prep_weights(wqkv, bqkv, wproj, bproj, nh, scale)
    rpb = _build_rpb_diag(bias, p)
    maskdiag = _build_mask_diag(mask, nwm, p, n)
    g = maskdiag.shape[0]

    dtype = xw.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    wk = w.astype(cdt)
    wpk = wp.astype(cdt)

    kernel = functools.partial(
        _kernel, num_heads=nh, hdp=hdp, p=p, n=n, c=c, cdt=cdt
    )
    if mask is None:
        # head-independent tile is constant: index 0 every step -> the
        # revolving buffer fetches it once
        mask_index = lambda i: (0, 0, 0)
    else:
        mask_index = lambda i: (i % g, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid=(bw // p,),
        in_specs=[
            pl.BlockSpec((p, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, wk.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wpk.shape[0], c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, p * n, p * n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p * n, p * n), mask_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (p, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), dtype),
        interpret=interpret,
    )(xw, wk, b, wpk, bp, rpb, jnp.asarray(maskdiag))
    return out


def fused_window_block_attention(
    xw, wqkv, bqkv, wproj, bproj, bias,
    mask=None, scale=1.0, interpret=None,
):
    """Fused qkv-proj + window attention + out-proj (differentiable).

    xw:    [B*nW, N, C] windowed features (post-norm), bf16/fp32
    wqkv:  [C, 3C] raw Dense kernel; bqkv: [3C] or None
    wproj: [C, C] raw Dense kernel;  bproj: [C]
    bias:  [nH, N, N] relative-position bias (gathered from the table —
           a traced value so table grads flow)
    mask:  numpy [nW_img, N, N] shift mask or None (trace-time constant)
    scale: attention scale (hd^-0.5)
    Returns [B*nW, N, C] in xw.dtype.

    The backward pass is the jnp reference implementation via
    custom_vjp (recompute; exact math, no second kernel).
    `interpret=None` auto-selects Pallas interpret mode off-TPU so the
    same model code runs on the CPU test mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Mosaic collapses [P, N, C] -> [P*N, C] inside the kernel, which
    # needs N sublane-aligned.  HAT's ws=7 gives N=49: pad the token dim
    # to the next multiple of 8 with -1e9 bias on the pad KEY columns so
    # real queries ignore the dead tokens (their own output rows are
    # garbage-but-finite and sliced off).  hat_arch.py:130-197 semantics
    # are unchanged.
    n = xw.shape[1]
    npad = (-n) % 8
    if npad:
        xw_in = jnp.pad(xw, ((0, 0), (0, npad), (0, 0)))
        bias_in = jnp.pad(
            bias, ((0, 0), (0, npad), (0, npad)), constant_values=-1e9
        )
        mask_in = (
            None
            if mask is None
            else np.pad(np.asarray(mask, np.float32),
                        ((0, 0), (0, npad), (0, npad)))
        )
    else:
        xw_in, bias_in, mask_in = xw, bias, mask

    @jax.custom_vjp
    def op(xw, wqkv, bqkv, wproj, bproj, bias):
        return _fused_forward(
            xw, wqkv, bqkv, wproj, bproj, bias, mask_in, scale, interpret
        )

    def op_fwd(xw, wqkv, bqkv, wproj, bproj, bias):
        out = _fused_forward(
            xw, wqkv, bqkv, wproj, bproj, bias, mask_in, scale, interpret
        )
        return out, (xw, wqkv, bqkv, wproj, bproj, bias)

    def op_bwd(res, ct):
        _, vjp = jax.vjp(
            lambda *a: _reference_impl(*a, mask_in, scale), *res
        )
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(op_fwd, op_bwd)
    out = op(xw_in, wqkv, bqkv, wproj, bproj, bias_in)
    if npad:
        # Grads w.r.t. the pad slices are dropped by the slice's own
        # vjp; xw/bias receive exact gradients through jnp.pad's vjp.
        out = out[:, :n, :]
    return out

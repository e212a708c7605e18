"""Fused XCiT channel attention — the front half of the DAT channel
block as ONE two-phase Pallas kernel (inference path).

Covers modules/dat_arch.py:441-509 up to (not including) the AIM
gating: LN1 -> qkv projection -> per-head channel-token matrices ->
L2-normalize q,k along tokens -> attn = softmax(temperature * q_hat @
k_hat^T) [nh, hd, hd] -> out = attn @ v, PLUS the parallel conv branch
(depthwise 3x3 on the full-C v, BatchNorm folded, exact GELU,
:471-475).  The back half (AIM + proj + LN2 + SGFN) is
ops/pallas/fused_datb_tail.py / the module tail, exactly as for the
spatial blocks (ops/pallas/fused_rect_attn.py).

Why a TWO-PHASE kernel: channel attention contracts over ALL tokens
(scores are [hd, hd] sums over T), so a strip-local kernel cannot see
the full contraction.  But the XCiT normalization factorizes:

    attn_raw[d, e] = sum_t q[d,t] k[e,t] / (||q_d|| ||k_e||)

so phase 0 accumulates the raw gram matrix G = q^T k ([C, C], f32
VMEM scratch — per-head blocks are its block diagonal) plus the
per-channel squared norms across row strips, and phase 1 re-reads
each strip, recomputes qkv (recompute is cheaper than round-tripping
[T, 3C] through HBM: ~0.1 ms MXU vs ~0.24 ms HBM at the production
shape), forms the softmaxed attention ONCE as a full [C, C] matrix
with an off-block-diagonal -inf mask (one softmax, no [30, 30]
per-head ops for Mosaic to reject), and applies out = v @ A^T per
strip.  The TPU Pallas grid is sequential on one core, which is what
makes cross-grid-step scratch accumulation sound (the same property
fused_block's backward uses for grad accumulation).

HBM traffic per block: read x twice + write attened_x + write conv_x
~= 4 passes of [T, C] bf16 (~0.12 ms at 256^2 C=180) vs the measured
1.23 ms module channel attention (PARITY "DAT floor analysis") whose
[B, nh, hd, N] channel-major relayouts XLA materializes in HBM.

Per-phase work p in {0: accumulate, 1: apply} is selected with
pl.when on program_id — both phases visit the same strip blocks; the
out-block writes of phase 0 are dead (overwritten when phase 1
revisits the same index map slot, grid order is sequential).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_superresolution_tpu.ops.pallas.fused_block import _gelu, _ln
from tpu_superresolution_tpu.ops.pallas import fused_datb_tail as _fdt

# Global impl switch (same contract as fused_rect_attn.FUSED_RECT):
# flip only on a measured >=2% interleaved win.
FUSED_CHAN = "off"

# Rows per strip.  8 keeps the apply phase ~9-10 MB of VMEM at the
# production shape (LN f32 + [T,3C] qkv + mxu dwconv shift copies);
# 16 was estimated ~17 MB — over budget before Mosaic even looks.
STRIP_ROWS = 8


def fused_chan_ok(h: int, w: int) -> bool:
    if FUSED_CHAN == "off":
        return False
    s = STRIP_ROWS
    if h % s or h < 2 * s:
        return False
    if _fdt.DW_COLS == "group8" and w % 8:
        return False
    import jax as _jax

    be = _jax.default_backend()
    if FUSED_CHAN == "auto":
        return be == "tpu"
    return be in ("tpu", "cpu")


def _kernel(x_ref, xt_ref, xb_ref, g1_ref, b1_ref, w_ref, b_ref,
            tcol_ref, wdw_ref, bdw_ref, att_ref, conv_ref,
            gram_ref, sq_ref, *, s, wdim, c, hd, ns, cdt):
    p = pl.program_id(1)
    r = pl.program_id(2)
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    rows = s + 2

    @pl.when((p == 0) & (r == 0))
    def _init():
        # re-zeroed at the start of every batch element's phase 0
        gram_ref[...] = jnp.zeros_like(gram_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    @pl.when(p == 0)
    def _accumulate():
        ya = _ln(
            x_ref[0].reshape(s * wdim, c).astype(f32), g1_ref[:], b1_ref[:]
        ).astype(cdt)
        qk = (
            dot(ya, w_ref[:, : 2 * c]) + b_ref[:, : 2 * c]
        ).astype(cdt)  # [T, 2C]
        q = qk[:, :c]
        k = qk[:, c:]
        # G += q^T k  (contract over tokens; per-head grams are the
        # hd-blocks of the diagonal, cross-head entries are masked at
        # apply time)
        gram_ref[...] += jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        qf = q.astype(f32)
        kf = k.astype(f32)
        sq_ref[0, :] += jnp.sum(qf * qf, axis=0)
        sq_ref[1, :] += jnp.sum(kf * kf, axis=0)

    @pl.when(p == 1)
    def _apply():
        # LN + qkv on the s+2 halo rows (halos feed the conv branch)
        xa = jnp.concatenate(
            [xt_ref[0], x_ref[0], xb_ref[0]], axis=0
        ).astype(cdt)
        ya = _ln(
            xa.reshape(rows * wdim, c).astype(f32), g1_ref[:], b1_ref[:]
        ).astype(cdt)
        qkv = (dot(ya, w_ref[:]) + b_ref[:]).astype(cdt)  # [T+2W, 3C]
        va = qkv[:, 2 * c :]

        # ---- attention matrix (recomputed per strip — [C, C] ops are
        # ~32 KFLOP, dwarfed by the strip dots) ----
        qn = jnp.maximum(jnp.sqrt(sq_ref[0, :]), 1e-12)  # [C]
        kn = jnp.maximum(jnp.sqrt(sq_ref[1, :]), 1e-12)
        ghat = gram_ref[...] / (qn[:, None] * kn[None, :])
        sc = ghat * tcol_ref[:]  # temperature, per query channel row
        ri = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        same_head = (ri // hd) == (ci // hd)
        sc = jnp.where(same_head, sc, -1e30)
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)

        # out[t, d] = sum_e A[d, e] v[t, e]  ->  v @ A^T
        vc = va.reshape(rows, wdim, c)[1 : s + 1].reshape(s * wdim, c)
        out = jax.lax.dot_general(
            vc, a, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        att_ref[...] = out.reshape(1, s, wdim, c).astype(att_ref.dtype)

        # ---- conv branch: dwconv3x3 (BN folded) + exact GELU ----
        convd = _fdt._dwconv_strip(
            va.reshape(rows, wdim, c), wdw_ref, bdw_ref, r, ns, s,
            wdim, c, cdt, _fdt.DW_COLS,
        )
        conv_ref[...] = (
            _gelu(convd, False).reshape(1, s, wdim, c).astype(conv_ref.dtype)
        )


def fused_channel_attention(
    x, g1, b1, wqkv, bqkv, temperature, wdw_folded, bdw_folded,
    num_heads, *, interpret: bool | None = None,
):
    """x: [B,H,W,C] RAW block input (LN1 runs inside).  temperature:
    the [nh, 1, 1] XCiT param (dat_arch.py:457).  wdw_folded
    [3,3,1,C] / bdw_folded [C]: conv-branch depthwise kernel with
    inference BN folded.  Returns (attened_x, conv_x), both
    [B,H,W,C]: the XCiT attention output and the gelu'd conv branch
    (AIM and everything after stay outside, exactly as for
    fused_rect_attention)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hh, ww, c = x.shape
    s = STRIP_ROWS
    ns = hh // s
    hd = c // num_heads
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    row = lambda a: jnp.asarray(a).reshape(1, -1).astype(jnp.float32)
    g1r, b1r = row(g1), row(b1)
    wq = jnp.asarray(wqkv).astype(cdt)
    bq = (
        row(bqkv)
        if bqkv is not None
        else jnp.zeros((1, 3 * c), jnp.float32)
    )
    # temperature per query-channel row, [C, 1] so it lands on
    # sublanes without an in-kernel transpose
    tcol = jnp.repeat(
        jnp.asarray(temperature, jnp.float32).reshape(num_heads), hd
    ).reshape(c, 1)
    wdw9 = jnp.asarray(wdw_folded).reshape(9, c).astype(jnp.float32)
    bdw9 = row(bdw_folded)

    grid = (b, 2, ns)
    cmap = lambda bb, p, r: (bb, r, 0, 0)
    tmap = lambda bb, p, r: (bb, jnp.maximum(s * r - 1, 0), 0, 0)
    bmap = lambda bb, p, r: (bb, jnp.minimum(s * r + s, hh - 1), 0, 0)
    strip = pl.BlockSpec((1, s, ww, c), cmap, memory_space=pltpu.VMEM)
    hrow = lambda m: pl.BlockSpec((1, 1, ww, c), m, memory_space=pltpu.VMEM)
    wspec = lambda arr: pl.BlockSpec(
        arr.shape, lambda bb, p, r: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _kernel, s=s, wdim=ww, c=c, hd=hd, ns=ns, cdt=cdt
    )
    att, conv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            strip, hrow(tmap), hrow(bmap),
            wspec(g1r), wspec(b1r), wspec(wq), wspec(bq),
            wspec(tcol), wspec(wdw9), wspec(bdw9),
        ],
        out_specs=(strip, strip),
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, g1r, b1r, wq, bq, tcol, wdw9, bdw9)
    return att, conv

"""Fused dual-rect window attention — the front half of the DAT
spatial block as ONE Pallas kernel (inference path).

Covers modules/dat_arch.py:247-438 up to (not including) the AIM
gating: LN1 -> qkv projection -> the two rectangular-window attention
branches (H-rect (s0,s1) on channel half 0, W-rect (s1,s0) on half 1,
:159-167) with dynamic-position bias and shift masks -> branch outputs
in spatial layout, PLUS the conv branch (depthwise 3x3 on the full-C
v, BatchNorm folded, exact GELU, :299-303).  The back half (AIM + proj
+ LN2 + SGFN) is ops/pallas/fused_datb_tail.py; between the two, the
only XLA ops left in a spatial DATB are the tiny global
channel-interaction gate, the shift roll-backs, and the half concat.

Why: the round-3 floor analysis (PARITY.md "DAT floor analysis")
attributes ~805 MB of fp32 attention-map HBM traffic per spatial block
to the jnp path — the maps never leave VMEM here.  The round-2
attention-only kernels lost to the HBM window relayout XLA had to
materialize around them; this kernel reads the SPATIAL strip directly
(like fused_block's spatial mode) and does the window-major transpose
in VMEM (leading-dims only).

Strip geometry: ms = max(s0, s1) rows x full width.  Both branch
orientations tile a strip exactly: branch 0 has ms/s0 window rows of
W/s1 windows, branch 1 has one window row of W/s0 windows; every
window has N = s0*s1 tokens.

Shifted blocks (:290,389): the caller passes pre-rolled views
x_r0 = roll(x, (-s0/2, -s1/2)), x_r1 = roll(x, (-s1/2, -s0/2)) — LN
and the qkv projection are pointwise per token, so rolling the INPUT
commutes with rolling q/k/v (what the module does).  Branch outputs
come back in rolled coordinates; the caller rolls them back.  The
conv branch always uses the true-coordinate x.  Shift masks are
passed whole ([nW, N, N] trace-time constants) and block-sliced per
strip.

Per-head layout follows fused_attention._prep_weights: qkv weights
rearranged per (part, head) with head dim zero-padded to hdp=32 lanes
and the q columns pre-scaled by hd^-0.5 — zero k/v pad lanes are
score/output no-ops, and the pad lanes are sliced off at the head
concat.
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

# Global impl switch (same contract as fused_datb_tail.FUSED_TAIL):
# flip only on a measured >=2% interleaved win.
FUSED_RECT = "off"

# Mosaic-rejection bisect ladder (experiments/fused_rect_diag.py):
# 0 = LN + v projection + passthrough outputs (refs/specs)
# 1 = + full qkv + window-major relayout and back (no attention)
# 2 = + attention with bias (no masks)
# 3 = + shift masks
# 4 = full kernel (+ conv branch dwconv)      <- production
DIAG_LEVEL = 4


def fused_rect_ok(h: int, w: int, s0: int, s1: int) -> bool:
    if FUSED_RECT == "off":
        return False
    ms, mn = max(s0, s1), min(s0, s1)
    if ms % mn:  # strip must hold whole windows of both orientations
        return False
    if h % ms or w % ms or h < 2 * ms:
        return False
    import jax as _jax

    return _jax.default_backend() in ("tpu", "cpu")


def _prep_branch_weights(wqkv, bqkv, c, half, nhb, scale, idx):
    """Slice branch `idx`'s q/k/v columns out of the raw [C, 3C] Dense
    kernel and rearrange to [C, 3*nhb*hdp] (part-major, head-padded,
    q pre-scaled).  Returns (w, b[1,-1], hdp)."""
    wqkv = jnp.asarray(wqkv)
    hd = half // nhb
    hdp = ((hd + 31) // 32) * 32
    pad = hdp - hd
    cols = []
    bcols = []
    for part in range(3):
        lo = part * c + idx * half
        wpart = wqkv[:, lo : lo + half].reshape(c, nhb, hd)
        bpart = (
            jnp.asarray(bqkv)[lo : lo + half].reshape(nhb, hd)
            if bqkv is not None
            else jnp.zeros((nhb, hd), jnp.float32)
        )
        if part == 0:
            wpart = wpart * scale
            bpart = bpart * scale
        cols.append(jnp.pad(wpart, ((0, 0), (0, 0), (0, pad))))
        bcols.append(jnp.pad(bpart.astype(jnp.float32), ((0, 0), (0, pad))))
    w = jnp.concatenate(cols, axis=1).reshape(c, 3 * nhb * hdp)
    b = jnp.concatenate(bcols, axis=0).reshape(1, 3 * nhb * hdp)
    return w, b, hdp


def _win_major(t, ms, hsp, wsp, wdim, cw):
    """[ms, W, cw] strip -> [nW, N, cw] window-major (leading-dims
    transpose in VMEM).  nW = (ms//hsp) * (W//wsp), N = hsp*wsp."""
    wr = ms // hsp
    wc = wdim // wsp
    t5 = t.reshape(wr, hsp, wc, wsp, cw)
    t5 = t5.transpose(0, 2, 1, 3, 4)
    return t5.reshape(wr * wc, hsp * wsp, cw)


def _win_reverse(t, ms, hsp, wsp, wdim, cw):
    wr = ms // hsp
    wc = wdim // wsp
    t5 = t.reshape(wr, wc, hsp, wsp, cw)
    t5 = t5.transpose(0, 2, 1, 3, 4)
    return t5.reshape(ms, wdim, cw)


def _kernel(*refs, s0, s1, ms, wdim, c, half, nhb, hdp, nr, cdt,
            shifted, level):
    """refs (in order): x, x_top, x_bot, [xr0, xr1,] gate-free weights:
    g1, b1, w0, b0, w1, b1b, wv, bv, bias0, bias1, [mask0, mask1,]
    wdw, bdw, then outputs o0, o1, conv."""
    refs = list(refs)
    x_ref, xt_ref, xb_ref = refs[:3]
    refs = refs[3:]
    if shifted:
        xr0_ref, xr1_ref = refs[:2]
        refs = refs[2:]
    (g1_ref, b1_ref, w0_ref, b0_ref, w1_ref, b1b_ref, wv_ref, bv_ref,
     bias0_ref, bias1_ref) = refs[:10]
    refs = refs[10:]
    if shifted:
        mask0_ref, mask1_ref = refs[:2]
        refs = refs[2:]
    wdw_ref, bdw_ref = refs[:2]
    o0_ref, o1_ref, conv_ref = refs[2:]

    r = pl.program_id(1)
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    hd = half // nhb
    n = s0 * s1

    # ---- conv branch: LN -> v (full C) on ms+2 halo rows -> dwconv ----
    xa = jnp.concatenate(
        [xt_ref[0], x_ref[0], xb_ref[0]], axis=0
    ).astype(cdt)
    rows = ms + 2
    xa2 = xa.reshape(rows * wdim, c)
    ya = _ln(xa2.astype(f32), g1_ref[:], b1_ref[:]).astype(cdt)
    va = (dot(ya, wv_ref[:]) + bv_ref[:]).astype(cdt)  # [T18, C]

    if level == 0:
        cc = va.reshape(rows, wdim, c)[1 : ms + 1]
        conv_ref[...] = cc.reshape(1, ms, wdim, c).astype(conv_ref.dtype)
        o0_ref[...] = (
            xa.reshape(rows, wdim, c)[1 : ms + 1, :, :half]
            .reshape(1, ms, wdim, half)
            .astype(o0_ref.dtype)
        )
        o1_ref[...] = o0_ref[...]
        return

    if level >= 4:
        convd = _fdt._dwconv_strip(
            va.reshape(rows, wdim, c), wdw_ref, bdw_ref, r, nr, ms,
            wdim, c, cdt, _fdt.DW_COLS,
        )  # BN pre-folded
        conv_ref[...] = (
            _gelu(convd, False)
            .reshape(1, ms, wdim, c)
            .astype(conv_ref.dtype)
        )
    else:
        cc = va.reshape(rows, wdim, c)[1 : ms + 1]
        conv_ref[...] = cc.reshape(1, ms, wdim, c).astype(conv_ref.dtype)

    # ---- attention branches ----
    for idx in (0, 1):
        hsp, wsp = (s0, s1) if idx == 0 else (s1, s0)
        w_ref = w0_ref if idx == 0 else w1_ref
        b_ref = b0_ref if idx == 0 else b1b_ref
        bias_ref = bias0_ref if idx == 0 else bias1_ref
        o_ref = o0_ref if idx == 0 else o1_ref
        if shifted:
            src = (xr0_ref if idx == 0 else xr1_ref)[0]  # [ms, W, C]
            yb = _ln(
                src.reshape(ms * wdim, c).astype(f32), g1_ref[:], b1_ref[:]
            ).astype(cdt)
        else:
            # center rows of the already-normed xa
            yb = ya.reshape(rows, wdim, c)[1 : ms + 1].reshape(
                ms * wdim, c
            )
        qkv = (dot(yb, w_ref[:]) + b_ref[:]).astype(cdt)  # [T, 3*nhb*hdp]
        cw = 3 * nhb * hdp
        win = _win_major(
            qkv.reshape(ms, wdim, cw), ms, hsp, wsp, wdim, cw
        )  # [nW, N, cw]
        nw = win.shape[0]

        if level == 1:
            back = _win_reverse(
                win[:, :, idx * half : idx * half + half],
                ms, hsp, wsp, wdim, half,
            )
            o_ref[...] = back.reshape(1, ms, wdim, half).astype(o_ref.dtype)
            continue

        outs = []
        for h in range(nhb):
            qo = (0 * nhb + h) * hdp
            ko = (1 * nhb + h) * hdp
            vo = (2 * nhb + h) * hdp
            q = win[:, :, qo : qo + hdp]
            k = win[:, :, ko : ko + hdp]
            vv = win[:, :, vo : vo + hdp]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # [nW, N, N]
            s = s + bias_ref[h]
            if shifted and level >= 3:
                s = s + mask_ref_sel(mask0_ref, mask1_ref, idx)[:]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            den = jnp.sum(e, axis=-1, keepdims=True)
            a = (e / den).astype(cdt)
            o = jax.lax.dot_general(
                a, vv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # [nW, N, hdp]
            outs.append(o[:, :, :hd].astype(cdt))
        ob = jnp.concatenate(outs, axis=-1)  # [nW, N, half]
        back = _win_reverse(ob, ms, hsp, wsp, wdim, half)
        o_ref[...] = back.reshape(1, ms, wdim, half).astype(o_ref.dtype)


def mask_ref_sel(mask0_ref, mask1_ref, idx):
    return mask0_ref if idx == 0 else mask1_ref


def fused_rect_attention(
    x, xr0, xr1, g1, b1, wqkv, bqkv, wdw_folded, bdw_folded,
    bias0, bias1, mask0, mask1, s0, s1, num_heads,
    *, interpret: bool | None = None,
):
    """x (+ pre-rolled xr0/xr1 when shifted, else None): [B,H,W,C].
    bias0/bias1: [nh/2, N, N] f32.  mask0/mask1: [nW_branch, N, N]
    numpy/f32 or None.  wdw_folded [3,3,1,C] / bdw_folded [C]: the conv
    branch's depthwise kernel with inference BN folded in.  Returns
    (o0, o1, conv_x): branch outputs [B,H,W,C/2] (in rolled coords when
    shifted) and the gelu'd conv branch [B,H,W,C]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hh, ww, c = x.shape
    ms = max(s0, s1)
    nr = hh // ms
    half = c // 2
    nhb = num_heads // 2
    hd = half // nhb
    shifted = xr0 is not None
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    n = s0 * s1
    nw_strip = (ms // s0) * (ww // s1)  # same count for both branches

    w0, b0, hdp = _prep_branch_weights(
        wqkv, bqkv, c, half, nhb, hd ** -0.5, 0
    )
    w1, b1b, _ = _prep_branch_weights(
        wqkv, bqkv, c, half, nhb, hd ** -0.5, 1
    )
    wv = jnp.asarray(wqkv)[:, 2 * c :]
    bv = (
        jnp.asarray(bqkv)[2 * c :].reshape(1, c).astype(jnp.float32)
        if bqkv is not None
        else jnp.zeros((1, c), jnp.float32)
    )
    row = lambda a: jnp.asarray(a).reshape(1, -1).astype(jnp.float32)
    wdw9 = jnp.asarray(wdw_folded).reshape(9, c).astype(jnp.float32)

    grid = (b, nr)
    cmap = lambda bb, r: (bb, r, 0, 0)
    tmap = lambda bb, r: (bb, jnp.maximum(ms * r - 1, 0), 0, 0)
    bmap = lambda bb, r: (bb, jnp.minimum(ms * r + ms, hh - 1), 0, 0)
    strip = pl.BlockSpec((1, ms, ww, c), cmap, memory_space=pltpu.VMEM)
    hrow = lambda m: pl.BlockSpec((1, 1, ww, c), m, memory_space=pltpu.VMEM)
    const = lambda nd: (lambda bb, r: (0,) * nd)
    wspec = lambda arr: pl.BlockSpec(
        arr.shape, const(arr.ndim), memory_space=pltpu.VMEM
    )

    args = [x, x, x]
    in_specs = [strip, hrow(tmap), hrow(bmap)]
    if shifted:
        args += [xr0.astype(dtype), xr1.astype(dtype)]
        in_specs += [strip, strip]
    weights = [
        row(g1), row(b1), w0.astype(cdt), b0, w1.astype(cdt), b1b,
        wv.astype(cdt), bv,
        jnp.asarray(bias0, jnp.float32), jnp.asarray(bias1, jnp.float32),
    ]
    args += weights
    in_specs += [wspec(a) for a in weights]
    if shifted:
        m0 = jnp.asarray(np.asarray(mask0, np.float32))
        m1 = jnp.asarray(np.asarray(mask1, np.float32))
        args += [m0, m1]
        in_specs += [
            pl.BlockSpec(
                (nw_strip, n, n), lambda bb, r: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nw_strip, n, n), lambda bb, r: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    args += [wdw9, row(bdw_folded)]
    in_specs += [wspec(wdw9), wspec(row(bdw_folded))]

    kernel = functools.partial(
        _kernel, s0=s0, s1=s1, ms=ms, wdim=ww, c=c, half=half, nhb=nhb,
        hdp=hdp, nr=nr, cdt=cdt, shifted=shifted, level=DIAG_LEVEL,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, hh, ww, half), dtype),
        jax.ShapeDtypeStruct((b, hh, ww, half), dtype),
        jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
    )
    out_specs = (
        pl.BlockSpec((1, ms, ww, half), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ms, ww, half), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ms, ww, c), cmap, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)

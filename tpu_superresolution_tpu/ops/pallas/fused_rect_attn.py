"""Fused dual-rect window attention — the front half of the DAT
spatial block as Pallas kernels (inference path).

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
come back in rolled coordinates; the caller rolls them back.  The conv
branch always uses the true-coordinate x.  Measured (fused_rect_diag):
the single-call shifted kernel exceeds VMEM (rejected at diag level 1
while unshifted passes), so shifted blocks run as TWO per-branch
pallas_calls — call 0 carries branch 0 + the conv branch, call 1 only
branch 1 — halving the resident strips; masks ride as [nW, N]
region-id labels compared in-kernel (the materialized [nW, N, N] mask
block was rejected at 256^2 even per-branch, fused_rect_diag2).

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

# Shifted blocks separately: even as two per-branch calls the shifted
# kernel is Mosaic-rejected at 256^2 from diag level 3 (masks) up
# (fused_rect_diag2, 2026-08-20) — with this "off", shifted spatial
# blocks fall back to the module chain (fused tail still applies) and
# only non-shifted blocks fuse.  Flip to "on" for retests when a new
# Mosaic lands (the kernel itself is parity-correct in interpret mode).
FUSED_RECT_SHIFTED = "off"

# Windows per score chunk in SHIFTED kernels: the shifted ladder dies
# exactly when the mask term joins the scores (diag level 3) with both
# mask forms (materialized [nW,N,N] input AND in-kernel region-id
# compare, fused_rect_diag2/diag3 2026-08-20) — pointing at the extra
# [nW,N,N] f32 temps, not the input.  Chunking the window axis bounds
# every score-sized temp at [SHIFT_CHUNK,N,N].  0 = no chunking.
SHIFT_CHUNK = 8

# Mosaic-rejection bisect ladder (experiments/fused_rect_diag.py):
# 0 = LN + v projection + passthrough outputs (refs/specs)
# 1 = + full qkv + window-major relayout and back (no attention)
# 2 = + attention with bias (no masks)
# 3 = + shift masks
# 4 = full kernel (+ conv branch dwconv)      <- production
DIAG_LEVEL = 4


# In-model compile ceiling (dat_rect_inmodel_diag + dat_fused_rect_ab3,
# 2026-08-20): the whole-model compile with this kernel inside crashes
# the axon chipless-AOT path at 256^2 — all call counts, warm cache,
# AND the TPU_ACCELERATOR_TYPE env vars the error suggests (client env
# does not reach the helper) — while 192^2 compiles and runs.  A
# remote-compiler environment bug, not a kernel property (the kernel
# compiles standalone at 256^2 in 27 s).  Production tiled inference
# runs <=192^2 tiles, so the ceiling costs nothing real; set None to
# retest on a new axon.  The ceiling is on TOTAL pixels (b*h*w):
# dat_fused_192_ab's b4 cell showed the same helper crash at
# 4 x 192^2, so batched tile stacks beyond one 192^2 image must keep
# the module chain too.
RECT_MAX_PIX: int | None = 192 * 192


def fused_rect_ok(
    h: int, w: int, s0: int, s1: int, shifted: bool = False, b: int = 1
) -> bool:
    if FUSED_RECT == "off":
        return False
    if shifted and FUSED_RECT_SHIFTED == "off":
        return False
    if RECT_MAX_PIX is not None and b * h * w > RECT_MAX_PIX:
        return False
    ms, mn = max(s0, s1), min(s0, s1)
    if ms % mn:  # strip must hold whole windows of both orientations
        return False
    if h % ms or w % ms or h < 2 * ms:
        return False
    if shifted:
        # The region-id mask BlockSpec is [windows-per-strip, N]; the
        # Mosaic lowering requires the sublane dim % 8 (measured: w=48
        # rejected in dat_fused_eval_check2, w=192 compiles).  Windows
        # per ms-row strip: branch0 (s0 x s1 rects) -> (ms/s0)*(w/s1),
        # branch1 (s1 x s0) -> (ms/s1)*(w/s0).
        if ((ms // s0) * (w // s1)) % 8 or ((ms // s1) * (w // s0)) % 8:
            return False
    if _fdt.DW_COLS == "group8" and w % 8:  # group8 conv-branch layout
        return False
    import jax as _jax

    be = _jax.default_backend()
    if FUSED_RECT == "auto":  # production default: real TPU only —
        return be == "tpu"    # CPU interpret mode is for tests ("on")
    return be in ("tpu", "cpu")


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
            shifted, level, branches, with_conv):
    """Ref order: [x, x_top, x_bot] (with_conv) | per-branch src
    (shifted) | g1, b1 | per-branch (w, b, bias[, mask]) |
    [wv, bv, wdw, bdw] (with_conv) | per-branch o_ref | [conv_ref]."""
    refs = list(refs)
    if with_conv:
        x_ref, xt_ref, xb_ref = refs[:3]
        refs = refs[3:]
    src_refs = {}
    if shifted:
        for idx in branches:
            src_refs[idx] = refs.pop(0)
    g1_ref = refs.pop(0)
    b1_ref = refs.pop(0)
    br = {}
    for idx in branches:
        w_ref = refs.pop(0)
        b_ref = refs.pop(0)
        bias_ref = refs.pop(0)
        m_ref = refs.pop(0) if shifted else None
        br[idx] = (w_ref, b_ref, bias_ref, m_ref)
    if with_conv:
        wv_ref, bv_ref, wdw_ref, bdw_ref = refs[:4]
        refs = refs[4:]
    o_refs = {idx: refs.pop(0) for idx in branches}
    conv_ref = refs.pop(0) if with_conv else None

    r = pl.program_id(1)
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    hd = half // nhb
    rows = ms + 2

    ya = None
    if with_conv:
        # ---- conv branch: LN -> v (full C) on ms+2 halo rows ----
        xa = jnp.concatenate(
            [xt_ref[0], x_ref[0], xb_ref[0]], axis=0
        ).astype(cdt)
        ya = _ln(
            xa.reshape(rows * wdim, c).astype(f32), g1_ref[:], b1_ref[:]
        ).astype(cdt)
        va = (dot(ya, wv_ref[:]) + bv_ref[:]).astype(cdt)  # [T18, C]

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
            conv_ref[...] = cc.reshape(1, ms, wdim, c).astype(
                conv_ref.dtype
            )

    # ---- attention branches ----
    for idx in branches:
        hsp, wsp = (s0, s1) if idx == 0 else (s1, s0)
        w_ref, b_ref, bias_ref, m_ref = br[idx]
        o_ref = o_refs[idx]
        if shifted:
            src = src_refs[idx][0]  # [ms, W, C] pre-rolled
            yb = _ln(
                src.reshape(ms * wdim, c).astype(f32), g1_ref[:],
                b1_ref[:],
            ).astype(cdt)
        else:
            # center rows of the already-normed xa
            yb = ya.reshape(rows, wdim, c)[1 : ms + 1].reshape(
                ms * wdim, c
            )
        if level == 0:
            o_ref[...] = (
                yb.reshape(ms, wdim, c)[:, :, :half]
                .reshape(1, ms, wdim, half)
                .astype(o_ref.dtype)
            )
            continue
        qkv = (dot(yb, w_ref[:]) + b_ref[:]).astype(cdt)
        cw = 3 * nhb * hdp
        win = _win_major(
            qkv.reshape(ms, wdim, cw), ms, hsp, wsp, wdim, cw
        )  # [nW, N, cw]

        if level == 1:
            back = _win_reverse(
                win[:, :, :half], ms, hsp, wsp, wdim, half
            )
            o_ref[...] = back.reshape(1, ms, wdim, half).astype(
                o_ref.dtype
            )
            continue

        def attend(qc, kc, vc, bias_h, rid_c):
            s = jax.lax.dot_general(
                qc, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # [nWc, N, N]
            s = s + bias_h
            if rid_c is not None:
                # region-id compare in place of the materialized
                # [nW, N, N] mask block (fused_rect_diag3: neither
                # mask form compiles UNCHUNKED at 256^2 — see
                # SHIFT_CHUNK)
                s = jnp.where(
                    rid_c[:, :, None] == rid_c[:, None, :], s, s - 100.0
                )
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            den = jnp.sum(e, axis=-1, keepdims=True)
            a = (e / den).astype(cdt)
            return jax.lax.dot_general(
                a, vc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # [nWc, N, hdp]

        nws = win.shape[0]
        chunk = SHIFT_CHUNK if (shifted and SHIFT_CHUNK) else nws
        outs = []
        for h in range(nhb):
            q = win[:, :, (0 * nhb + h) * hdp : (0 * nhb + h) * hdp + hdp]
            k = win[:, :, (1 * nhb + h) * hdp : (1 * nhb + h) * hdp + hdp]
            vv = win[:, :, (2 * nhb + h) * hdp : (2 * nhb + h) * hdp + hdp]
            och = []
            for w0 in range(0, nws, chunk):
                w1 = min(w0 + chunk, nws)
                rid_c = (
                    m_ref[w0:w1] if (shifted and level >= 3) else None
                )
                och.append(
                    attend(
                        q[w0:w1], k[w0:w1], vv[w0:w1], bias_ref[h], rid_c
                    )
                )
            o = och[0] if len(och) == 1 else jnp.concatenate(och, axis=0)
            outs.append(o[:, :, :hd].astype(cdt))
        ob = jnp.concatenate(outs, axis=-1)  # [nW, N, half]
        back = _win_reverse(ob, ms, hsp, wsp, wdim, half)
        o_ref[...] = back.reshape(1, ms, wdim, half).astype(o_ref.dtype)


def fused_rect_attention(
    x, xr0, xr1, g1, b1, wqkv, bqkv, wdw_folded, bdw_folded,
    bias0, bias1, mask0, mask1, s0, s1, num_heads,
    *, interpret: bool | None = None,
):
    """x (+ pre-rolled xr0/xr1 when shifted, else None): [B,H,W,C].
    bias0/bias1: [nh/2, N, N] f32.  mask0/mask1: [nW_branch, N] numpy
    int region-id labels (rect_shift_region_ids) or None — tokens
    attend iff labels match.  wdw_folded [3,3,1,C] / bdw_folded [C]: the conv
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

    wb = {}
    for idx in (0, 1):
        w_i, b_i, hdp = _prep_branch_weights(
            wqkv, bqkv, c, half, nhb, hd ** -0.5, idx
        )
        wb[idx] = (w_i.astype(cdt), b_i)
    wv = jnp.asarray(wqkv)[:, 2 * c :].astype(cdt)
    bv = (
        jnp.asarray(bqkv)[2 * c :].reshape(1, c).astype(jnp.float32)
        if bqkv is not None
        else jnp.zeros((1, c), jnp.float32)
    )
    row = lambda a: jnp.asarray(a).reshape(1, -1).astype(jnp.float32)
    g1r, b1r = row(g1), row(b1)
    wdw9 = jnp.asarray(wdw_folded).reshape(9, c).astype(jnp.float32)
    bdw9 = row(bdw_folded)
    biases = {
        0: jnp.asarray(bias0, jnp.float32),
        1: jnp.asarray(bias1, jnp.float32),
    }
    masks = {}
    if shifted:
        # [nW, N] f32 region ids (ops/window.py::rect_shift_region_ids)
        # — the penalty is formed in-kernel by an id compare; small
        # integer labels are exact in f32
        masks[0] = jnp.asarray(np.asarray(mask0), jnp.float32)
        masks[1] = jnp.asarray(np.asarray(mask1), jnp.float32)

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
    mspec = pl.BlockSpec(
        (nw_strip, n), lambda bb, r: (r, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec((1, ms, ww, half), cmap, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, ms, ww, c), cmap, memory_space=pltpu.VMEM)

    def call(branches, with_conv, srcs):
        args, specs = [], []
        if with_conv:
            args += [x, x, x]
            specs += [strip, hrow(tmap), hrow(bmap)]
        if shifted:
            for idx in branches:
                args.append(srcs[idx].astype(dtype))
                specs.append(strip)
        args += [g1r, b1r]
        specs += [wspec(g1r), wspec(b1r)]
        for idx in branches:
            args += [wb[idx][0], wb[idx][1], biases[idx]]
            specs += [wspec(a) for a in (wb[idx][0], wb[idx][1], biases[idx])]
            if shifted:
                args.append(masks[idx])
                specs.append(mspec)
        if with_conv:
            args += [wv, bv, wdw9, bdw9]
            specs += [wspec(a) for a in (wv, bv, wdw9, bdw9)]
        out_shapes = [
            jax.ShapeDtypeStruct((b, hh, ww, half), dtype)
            for _ in branches
        ]
        out_specs = [ospec for _ in branches]
        if with_conv:
            out_shapes.append(jax.ShapeDtypeStruct((b, hh, ww, c), dtype))
            out_specs.append(cspec)
        kernel = functools.partial(
            _kernel, s0=s0, s1=s1, ms=ms, wdim=ww, c=c, half=half,
            nhb=nhb, hdp=hdp, nr=nr, cdt=cdt, shifted=shifted,
            level=DIAG_LEVEL, branches=tuple(branches),
            with_conv=with_conv,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)

    if not shifted:
        o0, o1, conv_x = call((0, 1), True, {})
        return o0, o1, conv_x
    # shifted: two per-branch calls (VMEM — see module docstring)
    o0, conv_x = call((0,), True, {0: xr0})
    (o1,) = call((1,), False, {1: xr1})
    return o0, o1, conv_x

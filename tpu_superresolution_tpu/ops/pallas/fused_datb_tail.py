"""Fused DATB tail — AIM gating + proj + residual + LN2 + SGFN +
residual as ONE Pallas kernel (inference path).

Round-3's floor analysis (PARITY.md "DAT floor analysis") measured the
spatial DATB at ~1.8x its combined HBM floor and the SGFN alone at ~8x
its ~0.23 ms floor: every stage of the block tail round-trips a
[B,H,W,180] activation through HBM (gates, proj, residual, LN2, fc1,
sg_norm, dwconv, gate-mul, fc2, residual — ten+ passes).  This kernel
runs the whole tail per 8/16-row strip in VMEM, reading x / attened_x /
conv_x once and writing the block output once.

Reference semantics fused here (modules/dat_arch.py):
- AIM gating, both directions (:420-431 spatial, :510-521 channel).
  The two block types use the SAME formula once arguments are ordered:
  the vector-gated tensor `u` is also the source of the per-pixel
  spatial map; `w_px` is the pixel-gated tensor:
    spatial block:  u = attened_x, w_px = conv_x
    channel block:  u = conv_x,    w_px = attened_x
  The channel gate (GAP -> 1x1 -> BN -> GELU -> 1x1 -> sigmoid,
  :304-310) is a global reduction, so it is computed OUTSIDE (it is a
  [B,C] vector — trivial) and passed in pre-sigmoided; the spatial map
  (1x1 -> BN -> GELU -> 1x1 -> sigmoid, :311-316) is per-pixel and is
  fused, with its BatchNorm folded into the first 1x1 at trace time
  (inference BN is affine).
- proj Dense + residual (:433-437, :523-527, :559-562; drop_path is
  identity at inference).
- LN2 + SGFN (:38-90): fc1 -> exact GELU -> split -> LayerNorm ->
  depthwise 3x3 (SAME, zero pad) -> gate multiply -> fc2 -> residual.

The depthwise conv needs one halo row above/below the strip; halo rows
of the SGFN input x2 = x + proj(gated) are recomputed in-kernel from
single-row neighbor reads of x/u/w_px (separate (1,1,W,C) block refs
with clamped index maps).  At image top/bottom edges the halo
contribution is zeroed (SAME zero padding), masking the clamped reads.

Blocks are (1, S, W, C) row strips: the block's last two dims equal the
array dims, so any S/W/C is Mosaic-legal (cf. fused_block.py
megakernel_tpu_ok).  Grid (B, H//S), sequential on one core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_superresolution_tpu.ops.pallas.fused_block import _gelu, _ln

# Rows per strip.  8 keeps the working set ~7 MB of VMEM at the DAT
# production shape (W=256, C=180, hidden=360); 16 halves the grid-step
# count.  A/B: experiments/dat_fused_tail_ab.py.
STRIP_ROWS = 8

# Global impl switch (module convention: flip only on a measured >=2%
# interleaved win — experiments/dat_fused_tail_ab.py).  "on" routes
# every eligible inference DATB tail through this kernel; "off" keeps
# the reference module chain.  Training always uses the module path
# (BatchNorm batch stats + drop_path live there).
FUSED_TAIL = "off"


# In-model compile ceiling on TOTAL pixels (b*h*w), same class as
# fused_rect_attn.RECT_MAX_PIX: the tail kernel compiles in-model at
# 1 x 192^2 (dat_fused_192_ab, -30% stack win) but the whole-model
# compile crashes the axon helper at 256^2 (fused_tail_diag5/ab4) and
# at 4 x 192^2 (dat_fused_192_ab b4 cell).  Set None to retest on a
# new axon.
TAIL_MAX_PIX: int | None = 192 * 192


def fused_tail_ok(
    h: int, w: int, backend: str | None = None, b: int = 1
) -> bool:
    """Eligibility: whole strips only (callers pad DAT inputs to
    split-size multiples >= 8/16 already, so H % 8 == 0 in practice)."""
    if FUSED_TAIL == "off":
        return False
    if TAIL_MAX_PIX is not None and b * h * w > TAIL_MAX_PIX:
        return False
    if h % STRIP_ROWS or h < 2 * STRIP_ROWS:
        return False
    if DW_COLS == "group8" and w % 8:
        return False
    import jax as _jax

    be = backend or _jax.default_backend()
    if FUSED_TAIL == "auto":  # production default: real TPU only —
        return be == "tpu"    # CPU interpret mode is for tests ("on")
    return be in ("tpu", "cpu")  # cpu = interpret mode (tests)


# Mosaic-rejection bisect ladder (experiments/fused_tail_diag.py):
# 0 = read refs, write center x back (specs/index maps only)
# 1 = + AIM gates + proj + residual
# 2 = + LN2 + fc1 + gate-mul (no dwconv) + fc2
# 3 = full kernel (depthwise 3x3 with halo)   <- production
DIAG_LEVEL = 3

# Column-shift implementation inside the depthwise 3x3.  Sub-bisected
# on hardware (fused_tail_diag3/diag4): "rows3" (no column shifts)
# compiles, "concat" AND "roll" are both Mosaic-rejected — the
# shift-by-1 on a 256-extent sublane axis is the same compiler bug
# that killed the round-3/4 dwconv3x3_halo kernels — and "group8"
# (reshape W to [W/8, 8], 8-extent sublane concat + leading-dim group
# carry) sent the remote compiler into an 18-minute churn before the
# helper crashed (diag4, 2026-08-20).  "mxu" sidesteps shift
# constructs entirely: out[w] = in[w+-1] as a [W,W]@[W,C] matmul with
# a banded 0/1 matrix built from 2-D iota compares — pure dot ops in
# the layout the kernel already uses (no transpose/relayout), with the
# SAME-pad boundary column zeroed by the matrix itself.  Cost:
# 2*(S+2)*W^2*C extra MXU FLOPs per strip (~15 GFLOP per 256^2 block
# ~= tens of us) against the ~1.6 ms/block HBM win the fusion targets.
#   "mxu"    — production
#   "group8" / "concat" / "roll" — rejected forms, kept selectable
#                       for retests when a new Mosaic lands
#   "rows3"  — DIAGNOSTIC ONLY (wrong numerics, isolates the shift)
DW_COLS = "mxu"


def _dwconv_strip(h2r, wdw_ref, bdw_ref, r, nr, s, wdim, cw, cdt,
                  dw_cols):
    """Depthwise 3x3 (SAME zero pad) over an [s+2, W, cw] strip with
    single-row halos; returns the valid [s, W, cw] f32 result.  Halo
    rows at image edges are zeroed via scalar keep factors (the module
    conv zero-pads there and the clamped halo reads are garbage)."""
    f32 = jnp.float32
    rows = s + 2
    top_keep = jnp.where(r == 0, 0.0, 1.0).astype(cdt)
    bot_keep = jnp.where(r == nr - 1, 0.0, 1.0).astype(cdt)
    h2r = jnp.concatenate(
        [
            h2r[0:1] * top_keep,
            h2r[1 : rows - 1],
            h2r[rows - 1 : rows] * bot_keep,
        ],
        axis=0,
    )
    if dw_cols == "roll":
        col = jax.lax.broadcasted_iota(jnp.int32, (s, wdim, cw), 1)
    ng = wdim // 8

    if dw_cols == "mxu":
        # out[., w] = in[., w+delta] as a banded-selection matmul
        # M @ row with M[w, v] = (v == w + delta): pure dots in the
        # kernel's native [W, C] layout — no sublane-shift construct
        # for Mosaic to reject — and the SAME-pad boundary column is
        # zeroed by M's all-zero edge row.  Selection matmuls are
        # exact in bf16 (each output element copies one input).
        ri = jax.lax.broadcasted_iota(jnp.int32, (wdim, wdim), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (wdim, wdim), 1)

        def shift_mxu(strip, delta):
            # f32 accumulator: Mosaic rejects bf16 matmul acc at real
            # shapes ("Expected matmul acc to be 32-bit",
            # dat_fused_rect_ab 2026-08-20); the selection matmul is
            # exact either way, so acc precision is a no-op numerically.
            m = (ci == ri + delta).astype(cdt)
            return jnp.concatenate(
                [
                    jnp.dot(
                        m, strip[i].astype(cdt),
                        preferred_element_type=jnp.float32,
                    ).astype(cdt).reshape(1, wdim, cw)
                    for i in range(strip.shape[0])
                ],
                axis=0,
            )

        # shift the full (s+2)-row strip once per direction, then
        # band-slice in the tap loop (3 bands share the shifted rows)
        west = shift_mxu(h2r, -1)  # out[., w] = in[., w-1]
        east = shift_mxu(h2r, 1)   # out[., w] = in[., w+1]

    def shift_group8(rband, dx):
        # [s, W, cw] -> [s, W/8, 8, cw]; shift-by-1 along W as an
        # 8-extent sublane concat + leading-dim group carry.
        g8 = rband.reshape(s, ng, 8, cw)
        if dx == 0:  # west neighbor: out[., w] = in[., w-1], zero w=0
            carry = g8[:, :, 7:8, :]  # last col of each group
            carry = jnp.concatenate(
                [jnp.zeros((s, 1, 1, cw), rband.dtype), carry[:, : ng - 1]],
                axis=1,
            )
            sh = jnp.concatenate([carry, g8[:, :, :7, :]], axis=2)
        else:  # east neighbor: out[., w] = in[., w+1], zero w=W-1
            carry = g8[:, :, 0:1, :]
            carry = jnp.concatenate(
                [carry[:, 1:], jnp.zeros((s, 1, 1, cw), rband.dtype)],
                axis=1,
            )
            sh = jnp.concatenate([g8[:, :, 1:, :], carry], axis=2)
        return sh.reshape(s, wdim, cw)

    zcol = jnp.zeros((s, 1, cw), cdt)
    acc = jnp.zeros((s, wdim, cw), f32)
    for dy in range(3):
        rband = h2r[dy : dy + s]
        for dx in range(3):
            if dx == 1 or dw_cols == "rows3":
                if dx != 1 and dw_cols == "rows3":
                    continue
                sh = rband
            elif dw_cols == "mxu":
                sh = (west if dx == 0 else east)[dy : dy + s]
            elif dw_cols == "group8":
                sh = shift_group8(rband, dx)
            elif dw_cols == "concat":
                if dx == 0:  # west neighbor, zero col 0
                    sh = jnp.concatenate(
                        [zcol, rband[:, : wdim - 1]], axis=1
                    )
                else:  # east neighbor, zero last col
                    sh = jnp.concatenate([rband[:, 1:], zcol], axis=1)
            else:  # "roll" (shift must be non-negative: left = W-1)
                shift = 1 if dx == 0 else wdim - 1
                sh = pltpu.roll(rband, shift=shift, axis=1)
                edge = 0 if dx == 0 else wdim - 1
                sh = jnp.where(col == edge, jnp.zeros((), cdt), sh)
            tap = wdw_ref[3 * dy + dx : 3 * dy + dx + 1, :].reshape(
                1, 1, cw
            )
            acc = acc + sh.astype(f32) * tap.astype(f32)
    return acc + bdw_ref[:].reshape(1, 1, cw)


def _kernel(x_ref, xt_ref, xb_ref, u_ref, ut_ref, ub_ref,
            w_ref, wt_ref, wb_ref, gate_ref,
            sp_w1_ref, sp_b1_ref, sp_w2_ref, sp_b2_ref,
            wproj_ref, bproj_ref, g2_ref, b2_ref,
            wfc1_ref, bfc1_ref, gsg_ref, bsg_ref,
            wdw_ref, bdw_ref, wfc2_ref, bfc2_ref,
            o_ref, *, s, wdim, c, half, nr, cdt, level, dw_cols):
    r = pl.program_id(1)
    f32 = jnp.float32

    def assemble(cref, tref, bref):
        # [S+2, W, C] strip with single-row halos (clamped at edges;
        # edge garbage is masked out of the dwconv below).
        return jnp.concatenate(
            [tref[0], cref[0], bref[0]], axis=0
        ).astype(cdt)

    xa = assemble(x_ref, xt_ref, xb_ref)
    ua = assemble(u_ref, ut_ref, ub_ref)
    wa = assemble(w_ref, wt_ref, wb_ref)
    rows = s + 2
    t18 = rows * wdim
    xa = xa.reshape(t18, c)
    ua = ua.reshape(t18, c)
    wa = wa.reshape(t18, c)

    def center(t2d, width):
        return t2d.reshape(rows, wdim, width)[1 : s + 1].reshape(
            s * wdim, width
        )

    if level == 0:
        o_ref[...] = (
            (xa + ua + wa).reshape(rows, wdim, c)[1 : s + 1]
            .reshape(1, s, wdim, c)
            .astype(o_ref.dtype)
        )
        return

    dot = functools.partial(jnp.dot, preferred_element_type=f32)

    # ---- AIM: per-pixel spatial map from u (BN pre-folded into fc1),
    # channel gate vector precomputed outside (dat_arch.py:420-431) ----
    pm = _gelu(dot(ua, sp_w1_ref[:]) + sp_b1_ref[:], False)
    pm = dot(pm.astype(cdt), sp_w2_ref[:]) + sp_b2_ref[:]  # [T,1] f32
    gate = gate_ref[0]  # [1, C] f32, already sigmoid(channel_map)
    sgated = (
        ua.astype(f32) * gate + wa.astype(f32) * jax.nn.sigmoid(pm)
    ).astype(cdt)

    # ---- proj + residual ----
    x2 = xa.astype(f32) + dot(sgated, wproj_ref[:]) + bproj_ref[:]

    if level == 1:
        o_ref[...] = center(x2, c).reshape(1, s, wdim, c).astype(o_ref.dtype)
        return

    # ---- LN2 + SGFN fc1 + exact GELU ----
    y = _ln(x2, g2_ref[:], b2_ref[:]).astype(cdt)
    h = _gelu(dot(y, wfc1_ref[:]) + bfc1_ref[:], False)  # [T, hid] f32
    h1 = h[:, :half]
    h2 = _ln(h[:, half:], gsg_ref[:], bsg_ref[:]).astype(cdt)

    if level >= 3:
        # ---- depthwise 3x3 on h2 (SAME zero pad), valid on center ----
        h2c = _dwconv_strip(
            h2.reshape(rows, wdim, half), wdw_ref, bdw_ref, r, nr, s,
            wdim, half, cdt, dw_cols,
        )
        h2g = h2c.reshape(s * wdim, half)
    else:
        h2g = center(h2.astype(f32), half)

    # ---- gate multiply + fc2 + residual ----
    g = (center(h1, half) * h2g).astype(cdt)
    out = center(x2, c) + dot(g, wfc2_ref[:]) + bfc2_ref[:]
    o_ref[...] = out.reshape(1, s, wdim, c).astype(o_ref.dtype)


def fused_datb_tail(
    x, u, w_px, gate_sig,
    sp_w1, sp_b1, sp_w2, sp_b2,
    wproj, bproj, g2, b2,
    wfc1, bfc1, gsg, bsg, wdw, bdw, wfc2, bfc2,
    *, interpret: bool | None = None,
):
    """x, u, w_px: [B,H,W,C]; gate_sig: [B,C] (sigmoid already applied).
    sp_w1/sp_b1: spatial-interaction fc1 with inference BN folded in
    ([C, C//16], [C//16]); sp_w2/sp_b2: [C//16, 1], [1].
    wdw: [3,3,1,half] depthwise kernel (flax layout).  Returns the DATB
    output [B,H,W,C]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hh, ww, c = x.shape
    s = STRIP_ROWS
    nr = hh // s
    half = wfc2.shape[0]
    hid = wfc1.shape[1]
    assert hid == 2 * half, (hid, half)
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)

    grid = (b, nr)
    cmap = lambda bb, r: (bb, r, 0, 0)
    # single-row halo reads, clamped at the image edges
    tmap = lambda bb, r: (bb, jnp.maximum(s * r - 1, 0), 0, 0)
    bmap = lambda bb, r: (bb, jnp.minimum(s * r + s, hh - 1), 0, 0)
    strip = pl.BlockSpec((1, s, ww, c), cmap, memory_space=pltpu.VMEM)
    hrow = lambda m: pl.BlockSpec((1, 1, ww, c), m, memory_space=pltpu.VMEM)
    const = lambda nd: (lambda bb, r: (0,) * nd)
    wspec = lambda arr: pl.BlockSpec(
        arr.shape, const(arr.ndim), memory_space=pltpu.VMEM
    )

    gate3 = gate_sig.reshape(b, 1, c).astype(jnp.float32)
    wdw9 = wdw.reshape(9, half).astype(jnp.float32)

    weights = [
        sp_w1.astype(cdt), row(sp_b1), sp_w2.astype(cdt), row(sp_b2),
        wproj.astype(cdt), row(bproj), row(g2), row(b2),
        wfc1.astype(cdt), row(bfc1), row(gsg), row(bsg),
        wdw9, row(bdw), wfc2.astype(cdt), row(bfc2),
    ]
    in_specs = (
        [strip, hrow(tmap), hrow(bmap)] * 3
        + [
            pl.BlockSpec(
                (1, 1, c), lambda bb, r: (bb, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + [wspec(a) for a in weights]
    )
    args = (
        [x, x, x, u.astype(dtype), u.astype(dtype), u.astype(dtype),
         w_px.astype(dtype), w_px.astype(dtype), w_px.astype(dtype),
         gate3]
        + weights
    )

    kernel = functools.partial(
        _kernel, s=s, wdim=ww, c=c, half=half, nr=nr, cdt=cdt,
        level=DIAG_LEVEL, dw_cols=DW_COLS,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, ww, c), cmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), dtype),
        interpret=interpret,
    )(*args)


def fold_bn_into_dense(wk, bk, bn_scale, bn_bias, bn_mean, bn_var,
                       eps=1e-5):
    """Fold an inference BatchNorm (y = (x-mean)/sqrt(var+eps)*scale
    + bias) into the preceding dense/1x1-conv weights."""
    s = bn_scale * jax.lax.rsqrt(bn_var + eps)
    return wk * s, bk * s + bn_bias - bn_mean * s

"""Full-SwinBlock Pallas megakernel: LayerNorm -> qkv -> windowed
bias/mask attention -> proj -> residual -> LayerNorm -> MLP -> residual,
all in ONE VMEM program per image strip.

Beyond ops/pallas/fused_attention.py (which fuses qkv+attn+proj but
still pays XLA window_partition / window_reverse layout passes plus
separate LN/MLP kernels around every pallas_call), this kernel:

- consumes the feature map [B, H, W, C] DIRECTLY.  Each grid step loads
  one VERTICAL strip of P windows — block (1, P*ws, ws, C), whose
  row-major flattening [P*ws*ws, C] is a free reshape in which window
  j's ws*ws tokens are CONTIGUOUS rows [j*N, (j+1)*N).  Window
  partition/reverse therefore disappear into free sublane-aligned
  slices, and attention is computed per window as P independent [N, N]
  score blocks — never the [T, T] cross-window matrix, whose off-window
  three-quarters would be -inf-masked dead FLOPs (measured round 2:
  the horizontal-strip [T, T] variant spent ~48% of its padded MXU
  FLOPs and 4x its softmax transcendentals on masked-out entries).
- uses the relative-position bias [nH, N, N] and the reference's shift
  mask [nW, N, N] (network_swinir.py:132-138) directly — no permuted
  tables; the mask rides in as a (P, 1, N, N) block of the
  [nwh, nww, N, N] reshape, indexed by the strip's grid position.
- runs both LayerNorms (fp32 stats, flax formula), the erf/tanh-gelu
  MLP, and both residual adds in VMEM.  Per block layer the only HBM
  traffic is x in + out out + resident weights (+ the mask block when
  shifted).
- reproduces the reference SwinTransformerBlock semantics
  (modules/network_swinir.py:239-279); the cyclic roll itself commutes
  with every pointwise op, so callers roll OUTSIDE (jnp.roll is a cheap
  XLA copy) and this kernel sees the rolled domain.

Backward: a matching Pallas kernel (_bwd_kernel) recomputes the forward
intermediates per strip in VMEM and chains the cotangent through
MLP/LN2/proj/attention/qkv/LN1, accumulating all weight grads across
grid steps (KERNEL_BACKWARD=False falls back to jax.vjp over the jnp
reference composition).  A packed-window variant of both kernels
(fused_packed_windows_block) serves window sizes whose strips can't
tile on Mosaic (ws%8 != 0, e.g. HAT's 7).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_superresolution_tpu.ops.pallas.fused_attention import _prep_weights

# Backward pass implementation switch: True = the Pallas backward
# megakernel (_bwd_kernel — recompute + cotangent chain per strip, all
# in VMEM, weight grads accumulated across grid steps); False = jax.vjp
# over the jnp reference composition (XLA autodiff — measured ~3x the
# round-1 einsum forward because it rematerializes [nW, N, N] attention
# tensors in HBM).
KERNEL_BACKWARD = True

# Default forward-kernel variant (see _kernel's v4 switches).  "+"-joined
# tokens: "exp2" (base-2 softmax on pre-scaled logits), "pair"/"pair4"
# (2/4 windows per score block -> full-lane VPU softmax), "stackv"
# (stacked-head batched GEMMs + multi-contract proj).  Set per call via
# fused_swin_block(variant=...) or globally here.
MEGA_VARIANT = "v3"

# Sample-folding switch (see _mega_forward): at inference, pairs of
# short samples stack vertically into one strip via a free reshape,
# doubling T.  Global off-switch for A/B measurement and as a safety
# valve; per-call gating rides branch_scales=None.
ALLOW_FOLD = True

# Minimum batch for folding an ODD batch (zero-pad sample): the pad
# costs 1/B extra compute, which at b=25 exactly ate the fold's ~4.7%
# win (PARITY.md round 3) — only pad when it is <~2% of the batch.
FOLD_ODD_MIN_B = 48

# Windows per grid step for the packed-window megakernel (HAT's ws=7
# path).  Callers pad their window count to a multiple of this before
# partitioning.  Measured (v5e, HAT 256^2 x4 whole forward, outputs
# bitwise identical): group 8 = 98.7 ms, 16 = 94.5, 32 = 99.4 — fewer
# grid steps win until VMEM pressure bites.
PACKED_GROUP = 16

# Windows per grid step for the packed BACKWARD kernel.  The backward
# keeps roughly twice the forward's live VMEM (ct + x blocks plus the
# recompute chain and weight-grad accumulators): at group 16 the HAT
# train step OOMs the 16 MB scoped-VMEM stack by 555 KB
# (hat_train_split.log 2026-08-19, bf16[896,56,96] blocks) — the
# whole-HAT backward never compiled at 16; round 3's 97.9 ms train
# step predates the group-16 flip.  8 fits.
PACKED_GROUP_BWD = 8

# Forward-kernel variant for the packed path (same tokens as
# MEGA_VARIANT).  The packed chain is latency-bound on its serial
# per-step op sequence (PARITY.md round 3); "stackv" collapses the
# per-head score/AV loop into stacked batched GEMMs and "pair"/"pair4"
# cut the count of tiny per-window matmuls by sharing one block-
# diagonal score block across 2/4 consecutive windows.
PACKED_VARIANT = "v3"

# Drop the q/k head-pad lanes from the PACKED forward's qkv layout:
# HAT's hd=16 heads pad to hdp=32, doubling the qkv GEMM width (576 vs
# 384 lanes at C=96/nh=6) and the per-head score-slice stride, on a
# path that is latency-bound on its serial per-step chain (PARITY.md
# round 3).  v keeps its padded lane — the MXU row-sum ones-column
# lives there.  Bitwise identical (the dropped lanes are exact zeros
# in the contraction).  A/B-gated, forward-only: the backward
# recomputes from raw weights at the padded layout.
PACKED_QK_NOPAD = False

# Use the SPATIAL packed forward (fused_spatial_windows_block) for
# ws%8!=0 blocks: window-row x blocks read straight from the spatial
# array, killing the per-block XLA partition/pad/reverse copies the
# classic packed path pays.  A/B switch for measurement.
SPATIAL_PACKED = False

# Absorb the cyclic shift rolls into the strip megakernel's READS at
# inference: instead of jnp.roll(x, -s) -> kernel -> jnp.roll(out, +s)
# around every shifted block (~2.5 ms of SwinIR-M's 37.1 ms 256^2
# forward — each roll is a full HBM read+write pass at its bandwidth
# roofline), the kernel reads its strip at a (row, col) offset from up
# to four neighboring blocks and assembles the shifted view in VMEM
# (outer-dim row concat is free; the ws-sublane column concat+slice is
# a Mosaic relayout).  The stored activation stays in the PREVIOUS
# block's compute coordinates; RSTB threads the coordinate offset
# through its block sequence and pays ONE roll per layer tail instead
# of two per shifted block.  Differentiable (read_shift custom_vjp:
# rolls live only in the backward); SwinBlock gates it on no remat.
# MEASURED on v5e 2026-08-19 (experiments/logs/absorb_rolls_ab.log),
# outputs bitwise identical (maxdiff 0.0e0) at both shapes:
#   256^2 whole fwd: 47.00 -> 45.44 ms;  bench shape b25/t64:
#   65.73 -> 55.16 ms (-16%; the absorbed reads also unlock the odd-
#   batch fold split, which WINS under absorb: 55.16 vs 56.65 nofold,
#   while losing under rolls: 65.73 vs 60.68).  Default ON.
ABSORB_ROLLS = True

# Extend roll absorption to TRAINING (non-deterministic) forwards,
# including drop-path (the kernel's branch_scales ride through the
# read_shift custom_vjp unchanged).  The absorbed train step is
# unmeasured on hardware (experiments/swinir_train_absorb_ab.py) —
# default OFF until it wins interleaved.
ABSORB_TRAIN = False


def _variant_kwargs(variant: str) -> dict:
    kw = {"use_exp2": False, "pairw": 1, "stackv": False}
    for tok in variant.split("+"):
        if tok in ("v3", ""):
            continue
        if tok == "exp2":
            kw["use_exp2"] = True
        elif tok == "pair":
            kw["pairw"] = 2
        elif tok == "pair4":
            kw["pairw"] = 4
        elif tok == "stackv":
            kw["stackv"] = True
        else:
            raise ValueError(f"unknown megakernel variant token '{tok}'")
    return kw


_LOG2E = np.float32(1.4426950408889634)


def _prep_variant_weights(wqkv, bqkv, wproj, bproj, nh, c, scale, bias,
                          use_exp2, pairw, n):
    """Variant-aware weight/bias prep shared by the strip, packed and
    spatial forwards: exp2 pre-scaling of q/rpb (base-2 softmax), the
    head-padded kernel weight layout with the MXU row-sum ones-column
    planted at each head's first pad lane, and the block-diagonal rpb
    pairing (-1e9 off-diagonal) for pairw > 1."""
    sc_eff = scale * float(_LOG2E) if use_exp2 else scale
    w, bq, wp, bp, hdp = _prep_weights(wqkv, bqkv, wproj, bproj, nh, sc_eff)
    hd = c // nh
    if hdp > hd:
        koff = nh * hdp
        ones_cols = [2 * koff + h * hdp + hd for h in range(nh)]
        bq = bq.at[0, np.asarray(ones_cols)].set(1.0)
    bias_eff = bias.astype(jnp.float32)
    if use_exp2:
        bias_eff = bias_eff * _LOG2E
    if pairw > 1:
        n2 = n * pairw
        rpb = jnp.full((nh, n2, n2), -1e9, jnp.float32)
        for i in range(pairw):
            rpb = jax.lax.dynamic_update_slice(
                rpb, bias_eff, (0, i * n, i * n)
            )
        bias_eff = rpb
    return w, bq, wp, bp, hdp, bias_eff


def _pair_mask_blockdiag(m, pairw, n, axis):
    """Blockdiag `pairw` consecutive windows along `axis` of a numpy
    mask (..., n, n) -> (..., n*pairw, n*pairw) with zero off-diagonal
    blocks (the -1e9 cross-window entries ride the paired rpb)."""
    if pairw == 1:
        return m
    m = np.moveaxis(m, axis, 0)
    n2 = n * pairw
    out = np.zeros((m.shape[0] // pairw,) + m.shape[1:-2] + (n2, n2),
                   np.float32)
    for i in range(pairw):
        out[..., i * n : (i + 1) * n, i * n : (i + 1) * n] = m[i::pairw]
    return np.moveaxis(out, 0, axis)


def megakernel_tpu_ok(ws: int, w: int) -> bool:
    """Mosaic requires a block's last two dims to be (8, 128)-divisible
    or equal to the full array dims.  The megakernel's x block is
    (1, p*ws, ws, C): C always equals the array dim, but the window
    width ws must be 8-divisible unless the strip spans the whole padded
    width (nww == 1).  SwinIR's ws=8 passes; HAT's ws=7 must fall back
    to the window-packed kernels (whose blocks use full last-two dims).
    Interpret mode (CPU) has no such constraint — callers gate on the
    actual backend."""
    return ws % 8 == 0 or w == ws


def _ln(x32, scale, bias, eps=1e-5):
    """flax nn.LayerNorm (fast-variance) in fp32."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _erf_poly(x):
    """erf via Abramowitz&Stegun 7.1.26 (|eps| <= 1.5e-7 — below fp32
    noise at gelu scale).  Mosaic implements neither erf nor erfc, so
    the exact-gelu path inside TPU kernels uses this polynomial; the
    interpret/CPU result is within parity-test tolerance (3e-5) of
    jax.nn.gelu(approximate=False)."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * e


def _gelu(x, approximate):
    if approximate:
        return jax.nn.gelu(x, approximate=True)
    return x * 0.5 * (1.0 + _erf_poly(x * np.float32(0.7071067811865476)))


def _kernel(x_ref, *refs,
            num_heads, hdp, ws, p, c, cdt, gelu_approx,
            has_extra, has_mask, n=None, sample_blocks=0,
            use_exp2=False, pairw=1, stackv=False, spatial_ws=0,
            read_rc=None, hdp_qk=None):
    # Strip mode (default): blocks are (1, p*ws, ws, C) vertical strips,
    # grid (B, nchunks, nww), mask blocks (p, 1, n, n).  Packed mode
    # (n given, sample_blocks>0): blocks are (G, n, C) pre-partitioned
    # windows, 1-D grid over window blocks, mask blocks (G, n, n), and
    # the sample index is block_id // sample_blocks.  Spatial mode
    # (spatial_ws>0): blocks are (1, ws, W, C) window-ROW strips read
    # straight from the spatial array (legal for any ws because the
    # block's last two dims equal the array dims), grid (B, nwh), p =
    # nww windows rearranged to window-major in VMEM, mask blocks
    # (1, nww/pairw, n2, n2).  This kills the XLA window partition /
    # pad / reverse copies the packed path pays around every block.
    #
    # v4 variant switches (ablated on hardware — see PARITY.md):
    # - use_exp2: softmax in base-2.  The caller pre-scales q weights,
    #   rpb and mask by log2(e) at trace time, so exp(S-m) == exp2 of the
    #   pre-scaled scores — zero extra in-kernel ops if the VPU's exp2 is
    #   cheaper than exp.
    # - pairw: windows per score block.  N=64 scores occupy half a lane
    #   register; pairing two windows block-diagonally gives [2N, 2N]
    #   = full 128-lane VPU ops for max/exp and a K=128 AV GEMM, at the
    #   cost of 2x score-GEMM FLOPs (the -1e9 off-diagonal pair entries).
    # - stackv: replace the per-head AV loop + lane-concat with stacked
    #   [nH, P, N, hdp] batched GEMMs and a single multi-contract proj
    #   GEMM (K = nH*hdp = 192) against wproj reshaped [nH, hdp, C].
    refs = list(refs)
    # Roll-absorbing strip reads (ABSORB_ROLLS): the shifted view is
    # assembled in VMEM from the base block plus its row/column/corner
    # neighbors (wraps pre-resolved in the index maps).  Rows are an
    # outer-dim concat (free); columns concat on the ws sublane dim then
    # slice at the shift offset (a Mosaic relayout).
    xn_refs = []
    if read_rc is not None:
        _, _, row_nbr, col_nbr, _ = read_rc
        n_nbr = (1 if row_nbr else 0) + (
            (2 if row_nbr else 1) if col_nbr else 0
        )
        xn_refs = [refs.pop(0) for _ in range(n_nbr)]
    e_ref = refs.pop(0) if has_extra else None
    # [B, 2] SMEM (whole array — Mosaic requires SMEM blocks be full or
    # tile-aligned): per-sample branch scales (m1, m2), indexed by the
    # grid's batch coordinate.
    sc_ref = refs.pop(0)
    bb = (
        pl.program_id(0)
        if sample_blocks == 0
        else pl.program_id(0) // sample_blocks
    )
    (wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     g1_ref, b1_ref, g2_ref, b2_ref,
     wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, rpb_ref) = refs[:13]
    mask_ref = refs[13] if has_mask else None
    o_ref = refs[-1]

    if n is None:
        n = ws * ws
    t = p * n

    def win_major(ref):
        # (1, sw, p*sw, C) spatial block -> [p, n, C]-flat window-major
        # rows: split the column axis into p windows and swap it in
        # front of the row axis (a leading-dims transpose in VMEM).
        sw = spatial_ws
        r4 = ref[:].reshape(sw, p, sw, c)
        return r4.transpose(1, 0, 2, 3).reshape(t, c)

    if spatial_ws:
        xf = win_major(x_ref).astype(jnp.float32)
    elif read_rc is not None:
        rs, cs, row_nbr, col_nbr, segs = read_rc
        nrefs = iter(xn_refs)

        def _rows(base, nbr):
            # Shift the strip's rows by rs: cross-block (nbr supplies the
            # wrapped tail) or in-block per-sample segment rolls
            # (nchunks == 1; segs = fold factor).  Outer-dim slices/concat
            # — layout-free.
            if rs == 0:
                return base
            if row_nbr:
                return jnp.concatenate([base[rs:], nbr[:rs]], axis=0)
            seg_l = base.shape[0] // segs
            parts = []
            for k in range(segs):
                seg = base[k * seg_l : (k + 1) * seg_l]
                parts.append(
                    jnp.concatenate([seg[rs:], seg[:rs]], axis=0)
                )
            return jnp.concatenate(parts, axis=0) if segs > 1 else parts[0]

        xa = x_ref[0]  # [p*ws, ws, C]
        xb = next(nrefs)[0] if row_nbr else None
        left = _rows(xa, xb)
        if cs == 0:
            tile = left
        elif col_nbr:
            xc_ = next(nrefs)[0]
            xd_ = next(nrefs)[0] if row_nbr else None
            right = _rows(xc_, xd_)
            tile = jnp.concatenate([left, right], axis=1)[:, cs : cs + ws, :]
        else:
            tile = jnp.concatenate([left[:, cs:], left[:, :cs]], axis=1)
        xf = tile.reshape(t, c).astype(jnp.float32)
    else:
        xf = x_ref[:].reshape(t, c).astype(jnp.float32)

    # ---- LN1 -> qkv ----
    y = _ln(xf, g1_ref[:], b1_ref[:]).astype(cdt)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[:]).astype(cdt)

    # ---- per-window masked attention, batched over the P windows ----
    # Window j's tokens are the contiguous rows [j*N, (j+1)*N) of the
    # flattened strip, so [T, hdp] -> [P, N, hdp] is a free sublane
    # split and each head runs ONE batched [N, N] score matmul.
    #
    # Softmax structure (measured v5e, 0.85 -> 0.72 ms/block): all
    # heads' scores are stacked so max/exp run as ONE [nH,P,N,N] op,
    # and when the head dim is padded (hd < hdp) the row sums ride the
    # A*V matmul on the MXU instead of a VPU lane reduction — the
    # prepared qkv bias plants a constant-1.0 column at v's first pad
    # lane (see _mega_forward), so o_aug[..., hd] = sum_j e_ij and the
    # normalization becomes one reciprocal + multiply.  wproj's pad
    # rows are zero, so the un-normalized pad lanes never leak.
    hd = c // num_heads
    mxu_sum = hdp > hd
    # q/k sections may drop the head-pad lanes (PACKED_QK_NOPAD): their
    # per-head stride is hdq while v keeps hdp (its pad lane carries the
    # row-sum ones-column).  Zero pad lanes contribute exactly 0 to the
    # score contraction, so both layouts are bitwise identical.
    hdq = hdp if hdp_qk is None else hdp_qk
    koff = num_heads * hdq
    voff = 2 * koff
    pp = p // pairw
    n2 = n * pairw

    def head_slice(off, h, width=None):
        # window tokens are contiguous rows, so regrouping pairw windows
        # per score block is the same free sublane split
        wdt = hdp if width is None else width
        return qkv[:, off + h * wdt : off + (h + 1) * wdt].reshape(
            pp, n2, wdt
        )

    mterm = None
    if has_mask:
        if spatial_ws:
            mterm = mask_ref[0]  # block (1, PP, N2, N2)
        elif sample_blocks:
            mterm = mask_ref[:]
        else:
            mterm = mask_ref[:, 0]  # [PP, N2, N2]
    if stackv:
        # Mosaic's tpu.matmul supports at most ONE batch dim (measured —
        # the [nH, PP] two-batch-dim form is a verification error), so
        # heads and window groups merge into a single [nH*PP] batch.
        nb = num_heads * pp
        qs = jnp.stack(
            [head_slice(0, h, hdq) for h in range(num_heads)]
        ).reshape(nb, n2, hdq)
        ks = jnp.stack(
            [head_slice(koff, h, hdq) for h in range(num_heads)]
        ).reshape(nb, n2, hdq)
        S = jax.lax.dot_general(
            qs, ks, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nH*PP, N2, N2]
        S = S + jnp.broadcast_to(
            rpb_ref[:][:, None], (num_heads, pp, n2, n2)
        ).reshape(nb, n2, n2)
        if has_mask:
            S = S + jnp.broadcast_to(
                mterm[None], (num_heads, pp, n2, n2)
            ).reshape(nb, n2, n2)
    else:
        ss = []
        for h in range(num_heads):
            s = jax.lax.dot_general(
                head_slice(0, h, hdq), head_slice(koff, h, hdq),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [PP, N2, N2]
            ss.append(s + rpb_ref[h][None])
        S = jnp.stack(ss)  # [nH, PP, N2, N2] fp32
        if has_mask:
            S = S + mterm[None]
    m = jnp.max(S, axis=-1, keepdims=True)
    E = jnp.exp2(S - m) if use_exp2 else jnp.exp(S - m)
    if not mxu_sum:
        E = E / jnp.sum(E, axis=-1, keepdims=True)
    E = E.astype(cdt)
    if stackv:
        vs = jnp.stack(
            [head_slice(voff, h) for h in range(num_heads)]
        ).reshape(nb, n2, hdp)
        o = jax.lax.dot_general(
            E, vs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nH*PP, N2, hdp]
        if mxu_sum:
            o = o * (1.0 / o[..., hd : hd + 1])
        o3 = o.reshape(num_heads, t, hdp).astype(cdt)
        # proj as per-head batched GEMM + head-sum (wproj_ref is
        # [nH, hdp, C] in this mode); a 2-contracting-dim dot_general is
        # also outside tpu.matmul's support
        om = jax.lax.dot_general(
            o3, wproj_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nH, T, C]
        attn = jnp.sum(om, axis=0) + bproj_ref[:]
    else:
        outs = []
        for h in range(num_heads):
            o = jax.lax.dot_general(
                E[h], head_slice(voff, h), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [PP, N2, hdp]
            if mxu_sum:
                o = o * (1.0 / o[:, :, hd : hd + 1])
            outs.append(o.reshape(t, hdp).astype(cdt))
        o_cat = jnp.concatenate(outs, axis=-1)  # [T, nH*hdp]
        attn = jax.lax.dot_general(
            o_cat, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[:]

    # Per-sample stochastic-depth scales (hat_arch.py:12-38 semantics,
    # mask/keep in {0, 1/keep}); 1.0 at inference.  The CAB `extra` term
    # is NOT drop-pathed in the reference (hat_arch.py:307).
    x1 = xf + attn * sc_ref[bb, 0]
    if has_extra:
        # Caller-supplied additive term on the attention residual
        # (HAT's conv_scale * CAB branch — hat_arch.py:307-308).
        ef = win_major(e_ref) if spatial_ws else e_ref[:].reshape(t, c)
        x1 = x1 + ef.astype(jnp.float32)

    # ---- LN2 -> MLP -> residual ----
    y2 = _ln(x1, g2_ref[:], b2_ref[:]).astype(cdt)
    h1 = jax.lax.dot_general(
        y2, wfc1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc1_ref[:]
    h1 = _gelu(h1, gelu_approx).astype(cdt)
    mlp = jax.lax.dot_general(
        h1, wfc2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc2_ref[:]

    out = x1 + mlp * sc_ref[bb, 1]
    if spatial_ws:
        sw = spatial_ws
        o4 = out.astype(o_ref.dtype).reshape(p, sw, sw, c)
        o_ref[:] = o4.transpose(1, 0, 2, 3).reshape(x_ref.shape)
    else:
        o_ref[:] = out.astype(o_ref.dtype).reshape(x_ref.shape)


def _gelu_grad(x, approximate):
    """d gelu(x)/dx, matching jax.nn.gelu's two variants."""
    if approximate:
        c = np.sqrt(2.0 / np.pi).astype(np.float32)
        u = c * (x + 0.044715 * x * x * x)
        th = jnp.tanh(u)
        sech2 = 1.0 - th * th
        return 0.5 * (1.0 + th) + 0.5 * x * sech2 * c * (
            1.0 + 3.0 * 0.044715 * x * x
        )
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    phi = 0.5 * (1.0 + _erf_poly(x * inv_sqrt2))
    pdf = jnp.exp(-0.5 * x * x) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return phi + x * pdf


def _bwd_kernel(ct_ref, x_ref, *refs,
                num_heads, hdp, ws, p, c, cdt, gelu_approx,
                has_extra, has_mask, n=None, sample_blocks=0,
                grid_rank=3):
    # inputs: ct, x, [extra], scales, 13 weights, [mask]; outputs:
    # dx, [dextra], 13 weight-grad accumulators.
    """Backward of _kernel: recompute the forward intermediates in VMEM,
    chain the cotangent through MLP/LN2/proj/attention/qkv/LN1, and
    accumulate weight gradients across grid steps into constant-index
    output blocks (zero-initialized on the first step)."""
    refs = list(refs)
    e_ref = refs.pop(0) if has_extra else None
    sc_ref = refs.pop(0)
    (wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     g1_ref, b1_ref, g2_ref, b2_ref,
     wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, rpb_ref) = refs[:13]
    refs = refs[13:]
    mask_ref = refs.pop(0) if has_mask else None
    outs = refs
    dx_ref = outs.pop(0)
    dextra_ref = outs.pop(0) if has_extra else None
    (dw_ref, dbq_ref, dwp_ref, dbp_ref,
     dg1_ref, db1_ref, dg2_ref, db2_ref,
     dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref, drpb_ref) = outs

    bb = (
        pl.program_id(0)
        if sample_blocks == 0
        else pl.program_id(0) // sample_blocks
    )
    first = pl.program_id(0) == 0
    for d in range(1, grid_rank):
        first = first & (pl.program_id(d) == 0)

    @pl.when(first)
    def _init():
        for r in (dw_ref, dbq_ref, dwp_ref, dbp_ref,
                  dg1_ref, db1_ref, dg2_ref, db2_ref,
                  dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref, drpb_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    if n is None:
        n = ws * ws
    t = p * n
    hd = c // num_heads
    eps = 1e-5
    m1 = sc_ref[bb, 0]
    m2 = sc_ref[bb, 1]

    def _dot(a, b_, contract, batch=((), ())):
        return jax.lax.dot_general(
            a, b_, (contract, batch), preferred_element_type=jnp.float32
        )

    # ---- forward recompute ----
    xf = x_ref[:].reshape(t, c).astype(jnp.float32)
    mu1 = jnp.mean(xf, axis=-1, keepdims=True)
    var1 = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mu1 * mu1, 0.0)
    r1 = jax.lax.rsqrt(var1 + eps)
    n1 = (xf - mu1) * r1
    yc = (n1 * g1_ref[:] + b1_ref[:]).astype(cdt)
    qkv = (_dot(yc, wqkv_ref[:], (((1,), (0,)))) + bqkv_ref[:]).astype(cdt)

    koff = num_heads * hdp
    voff = 2 * koff
    ss = []
    for h in range(num_heads):
        q = qkv[:, h * hdp : (h + 1) * hdp].reshape(p, n, hdp)
        k = qkv[:, koff + h * hdp : koff + (h + 1) * hdp].reshape(p, n, hdp)
        s = _dot(q, k, ((2,), (2,)), ((0,), (0,)))
        ss.append(s + rpb_ref[h][None])
    S = jnp.stack(ss)
    if has_mask:
        mterm = mask_ref[:] if sample_blocks else mask_ref[:, 0]
        S = S + mterm[None]
    mx = jnp.max(S, axis=-1, keepdims=True)
    E = jnp.exp(S - mx)
    A = E / jnp.sum(E, axis=-1, keepdims=True)  # [nH, P, N, N] fp32
    Ac = A.astype(cdt)
    o_parts = []
    for h in range(num_heads):
        v = qkv[:, voff + h * hdp : voff + (h + 1) * hdp].reshape(p, n, hdp)
        o = _dot(Ac[h], v, ((2,), (1,)), ((0,), (0,)))
        o_parts.append(o.reshape(t, hdp).astype(cdt))
    o_cat = jnp.concatenate(o_parts, axis=-1)
    attn = _dot(o_cat, wproj_ref[:], ((1,), (0,))) + bproj_ref[:]

    x1 = xf + attn * m1
    if has_extra:
        x1 = x1 + e_ref[:].reshape(t, c).astype(jnp.float32)
    mu2 = jnp.mean(x1, axis=-1, keepdims=True)
    var2 = jnp.maximum(jnp.mean(x1 * x1, -1, keepdims=True) - mu2 * mu2, 0.0)
    r2 = jax.lax.rsqrt(var2 + eps)
    n2 = (x1 - mu2) * r2
    y2c = (n2 * g2_ref[:] + b2_ref[:]).astype(cdt)
    h1 = _dot(y2c, wfc1_ref[:], ((1,), (0,))) + bfc1_ref[:]
    a_act = _gelu(h1, gelu_approx)
    ac = a_act.astype(cdt)
    mlp = _dot(ac, wfc2_ref[:], ((1,), (0,))) + bfc2_ref[:]

    # ---- backward ----
    ct = ct_ref[:].reshape(t, c).astype(jnp.float32)
    dmlp = (ct * m2).astype(cdt)
    dwfc2_ref[...] += _dot(ac, dmlp, ((0,), (0,)))
    dbfc2_ref[...] += jnp.sum(dmlp.astype(jnp.float32), 0, keepdims=True)
    dac = _dot(dmlp, wfc2_ref[:], ((1,), (1,)))
    dh1 = (dac * _gelu_grad(h1, gelu_approx)).astype(cdt)
    dwfc1_ref[...] += _dot(y2c, dh1, ((0,), (0,)))
    dbfc1_ref[...] += jnp.sum(dh1.astype(jnp.float32), 0, keepdims=True)
    dy2 = _dot(dh1, wfc1_ref[:], ((1,), (1,)))

    dg2_ref[...] += jnp.sum(dy2 * n2, 0, keepdims=True)
    db2_ref[...] += jnp.sum(dy2, 0, keepdims=True)
    dyg2 = dy2 * g2_ref[:]
    dx1 = ct + r2 * (
        dyg2
        - jnp.mean(dyg2, -1, keepdims=True)
        - n2 * jnp.mean(dyg2 * n2, -1, keepdims=True)
    )

    if has_extra:
        dextra_ref[:] = dx1.astype(dextra_ref.dtype).reshape(dextra_ref.shape)
    dattn = (dx1 * m1).astype(cdt)
    dwp_ref[...] += _dot(o_cat, dattn, ((0,), (0,)))
    dbp_ref[...] += jnp.sum(dattn.astype(jnp.float32), 0, keepdims=True)
    do_cat = _dot(dattn, wproj_ref[:], ((1,), (1,))).astype(cdt)

    dq_parts, dk_parts, dv_parts = [], [], []
    dS_all = []
    for h in range(num_heads):
        do = do_cat[:, h * hdp : (h + 1) * hdp].reshape(p, n, hdp)
        v = qkv[:, voff + h * hdp : voff + (h + 1) * hdp].reshape(p, n, hdp)
        dv = _dot(Ac[h], do, ((1,), (1,)), ((0,), (0,)))  # [P, N, hdp]
        dA = _dot(do, v, ((2,), (2,)), ((0,), (0,)))  # [P, N, N]
        dSh = A[h] * (dA - jnp.sum(dA * A[h], -1, keepdims=True))
        dS_all.append(dSh)
        dSc = dSh.astype(cdt)
        q = qkv[:, h * hdp : (h + 1) * hdp].reshape(p, n, hdp)
        k = qkv[:, koff + h * hdp : koff + (h + 1) * hdp].reshape(p, n, hdp)
        dq = _dot(dSc, k, ((2,), (1,)), ((0,), (0,)))
        dk = _dot(dSc, q, ((1,), (1,)), ((0,), (0,)))
        dq_parts.append(dq.reshape(t, hdp).astype(cdt))
        dk_parts.append(dk.reshape(t, hdp).astype(cdt))
        dv_parts.append(dv.reshape(t, hdp).astype(cdt))
    drpb_ref[...] += jnp.stack([jnp.sum(d, axis=0) for d in dS_all])
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)

    dw_ref[...] += _dot(yc, dqkv, ((0,), (0,)))
    dbq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), 0, keepdims=True)
    dy_tok = _dot(dqkv, wqkv_ref[:], ((1,), (1,)))

    dg1_ref[...] += jnp.sum(dy_tok * n1, 0, keepdims=True)
    db1_ref[...] += jnp.sum(dy_tok, 0, keepdims=True)
    dyg1 = dy_tok * g1_ref[:]
    dxf = dx1 + r1 * (
        dyg1
        - jnp.mean(dyg1, -1, keepdims=True)
        - n1 * jnp.mean(dyg1 * n1, -1, keepdims=True)
    )
    dx_ref[:] = dxf.astype(dx_ref.dtype).reshape(dx_ref.shape)


def _reference_block(x, g1, b1, wqkv, bqkv, wproj, bproj,
                     g2, b2, wfc1, bfc1, wfc2, bfc2, bias, scales,
                     ws, mask, scale, gelu_approx, extra=None):
    """jnp composition with identical semantics (vjp + oracle).
    x: [B, H, W, C] (already rolled); scales: [B, 2] per-sample
    stochastic-depth branch multipliers (attn, mlp)."""
    from tpu_superresolution_tpu.ops.window import (
        window_partition,
        window_reverse,
    )
    from tpu_superresolution_tpu.ops.pallas.fused_attention import (
        _reference_impl,
    )

    b, hh, www, c = x.shape
    m1 = scales[:, 0].astype(jnp.float32)[:, None, None, None]
    m2 = scales[:, 1].astype(jnp.float32)[:, None, None, None]
    xf = x.astype(jnp.float32)
    y = _ln(xf, g1, b1).astype(x.dtype)
    xw = window_partition(y, ws)  # [B*nW, N, C]
    attn = _reference_impl(xw, wqkv, bqkv, wproj, bproj, bias, mask, scale)
    attn = window_reverse(attn, ws, hh, www).astype(jnp.float32)
    x1 = xf + attn * m1
    if extra is not None:
        x1 = x1 + extra.astype(jnp.float32)
    y2 = _ln(x1, g2, b2).astype(x.dtype)
    h1 = y2 @ wfc1.astype(x.dtype)
    h1 = h1 + bfc1.astype(x.dtype)
    h1 = _gelu(h1.astype(jnp.float32), gelu_approx).astype(x.dtype)
    mlp = h1 @ wfc2.astype(x.dtype) + bfc2.astype(x.dtype)
    out = x1 + mlp.astype(jnp.float32) * m2
    return out.astype(x.dtype)


def _mega_forward(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias, scales,
                  ws, mask, scale, gelu_approx, interpret, extra=None,
                  max_p=16, use_exp2=False, pairw=1, stackv=False,
                  allow_fold=False, read_shift=0):
    if read_shift:
        assert extra is None, "roll absorption does not support `extra`"
    b, hh, www, c = x.shape
    nh = bias.shape[0]
    nwh, nww = hh // ws, www // ws
    n = ws * ws

    # Sample folding (inference only — callers set allow_fold when the
    # branch scales are statically all-ones): two consecutive samples
    # stack vertically via a FREE reshape ([B, H, W, C] -> [B/2, 2H, W,
    # C] — samples are contiguous), doubling the strip length T when the
    # per-sample image is too short for the efficient T=1024 shape
    # (64-px tiles give T=512; measured round 2: 0.83 ms/block at
    # T=1024 vs ~1.0 at 512).  Windows never straddle the seam
    # (H % ws == 0) and the shift mask simply tiles on the window-row
    # axis.  Rolls happen OUTSIDE on the unfolded samples, so cyclic
    # wraparound never crosses the seam.
    # Measured (v5e, SwinIR-M tile-64 bf16): fold wins ~4.7% whole-model
    # on even batches (b8: 20.67 vs 21.68 ms); padding an odd batch to
    # even costs 1/B extra compute, which at b=25 exactly ate the gain
    # (57.7 vs 57.3 ms) — so odd batches only fold when the pad sample
    # is <~2% of the batch.
    fold_geom = (
        allow_fold
        and b >= 2
        and nwh * n <= 512
        and 2 * nwh <= max_p
        and 2 * nwh * n <= 1024
    )
    if fold_geom and b % 2 and 3 <= b < FOLD_ODD_MIN_B:
        # Odd batch below the pad threshold: split off the last sample
        # and fold the even remainder — two pallas_calls inside one jit
        # (the [b-1]-folded main body plus a 1-sample unfolded tail)
        # instead of padding to b+1 (the pad's 1/b extra compute ate the
        # ~4.7% fold win at b=25; the split keeps it minus one extra
        # kernel launch).
        common = (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias)
        kw = dict(gelu_approx=gelu_approx, interpret=interpret,
                  max_p=max_p, use_exp2=use_exp2, pairw=pairw,
                  stackv=stackv, read_shift=read_shift)
        main = _mega_forward(
            x[:-1], *common, scales[:-1], ws, mask, scale, **kw,
            extra=None if extra is None else extra[:-1], allow_fold=True,
        )
        tail = _mega_forward(
            x[-1:], *common, scales[-1:], ws, mask, scale, **kw,
            extra=None if extra is None else extra[-1:], allow_fold=False,
        )
        return jnp.concatenate([main, tail], axis=0)
    fold = fold_geom and (b % 2 == 0 or b >= FOLD_ODD_MIN_B)
    pad_sample = 0
    if fold:
        if b % 2:
            # Pad with one zero sample (sliced off below) — all-finite
            # through LN eps and the masked softmax.
            pad_sample = 1
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            if extra is not None:
                extra = jnp.concatenate(
                    [extra, jnp.zeros_like(extra[:1])], axis=0
                )
            b += 1
        b, hh, nwh = b // 2, 2 * hh, 2 * nwh
        x = x.reshape(b, hh, www, c)
        if extra is not None:
            extra = extra.reshape(b, hh, www, c)
        scales = jnp.ones((b, 2), jnp.float32)
        if mask is not None:
            m4 = np.asarray(mask, np.float32).reshape(nwh // 2, nww, n, n)
            mask = np.concatenate([m4, m4], axis=0).reshape(nwh * nww, n, n)
    # Largest divisor of nwh with T = p*N tokens under the VMEM budget.
    # Bigger strips win (measured v5e, 256x256x180: 0.82 ms/block at
    # T=1024 vs 1.17 at T=256) — the batched score matmuls amortize
    # better and the serial LN/GEMM chain pipelines deeper.
    p = 1
    for cand in range(min(max_p, nwh), 0, -1):
        if nwh % cand == 0 and cand * n <= 1024:
            p = cand
            break
    nchunks = nwh // p
    t = p * n
    if p % pairw:
        pairw = 1
    n2 = n * pairw

    w, bq, wp, bp, hdp, rpb = _prep_variant_weights(
        wqkv, bqkv, wproj, bproj, nh, c, scale, bias, use_exp2, pairw, n
    )
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1)

    grid = (b, nchunks, nww)

    def omap(bb, r, cc):
        return (bb, r, cc, 0)

    xmap = omap

    # Roll absorption (ABSORB_ROLLS; read_shift = compute-coords shift
    # minus stored-coords shift): the kernel reads its strip at a
    # (read_shift, read_shift) spatial offset.  Rows cross chunk blocks
    # (neighbor ref, wrap mod nchunks) or roll in-block when nchunks==1
    # (per original sample under folding — fold implies nchunks==1, see
    # fold_geom); columns cross window-column blocks (wrap mod nww).
    # The base block index shifts down one for negative offsets; the
    # output spec stays identity — results are written in compute
    # coordinates, which become the NEXT block's stored coordinates.
    read_rc = None
    x_nbr_specs = []
    if read_shift:
        v = read_shift
        pws = p * ws
        row_nbr = nchunks > 1
        col_nbr = nww > 1
        segs = 2 if fold else 1
        rs = v % pws if row_nbr else v % (pws // segs)
        cs = v % ws

        def base_r(r):
            return (r - 1) % nchunks if (v < 0 and row_nbr) else r

        def base_c(cc):
            return (cc - 1) % nww if (v < 0 and col_nbr) else cc

        def xm(dr=0, dc=0):
            return lambda bb, r, cc: (
                bb,
                (base_r(r) + dr) % nchunks,
                (base_c(cc) + dc) % nww,
                0,
            )

        bshape = (1, pws, ws, c)
        xmap = xm()
        if row_nbr:
            x_nbr_specs.append(
                pl.BlockSpec(bshape, xm(dr=1), memory_space=pltpu.VMEM)
            )
        if col_nbr:
            x_nbr_specs.append(
                pl.BlockSpec(bshape, xm(dc=1), memory_space=pltpu.VMEM)
            )
            if row_nbr:
                x_nbr_specs.append(
                    pl.BlockSpec(
                        bshape, xm(dr=1, dc=1), memory_space=pltpu.VMEM
                    )
                )
        read_rc = (rs, cs, row_nbr, col_nbr, segs)

    kernel = functools.partial(
        _kernel, num_heads=nh, hdp=hdp, ws=ws, p=p, c=c, cdt=cdt,
        gelu_approx=gelu_approx,
        has_extra=extra is not None, has_mask=mask is not None,
        use_exp2=use_exp2, pairw=pairw, stackv=stackv, read_rc=read_rc,
    )

    const = lambda *shape: (lambda bb, r, cc: tuple([0] * len(shape)))

    if stackv:
        wp_arr = wp.reshape(nh, hdp, c)
        wp_spec = pl.BlockSpec((nh, hdp, c), const(0, 0, 0), memory_space=pltpu.VMEM)
    else:
        wp_arr = wp
        wp_spec = pl.BlockSpec((wp.shape[0], c), const(0, 0), memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((1, p * ws, ws, c), xmap, memory_space=pltpu.VMEM)
    scspec = pl.BlockSpec(
        (b, 2), lambda bb, r, cc: (0, 0), memory_space=pltpu.SMEM
    )
    in_specs = (
        [xspec]
        + x_nbr_specs
        + ([xspec] if extra is not None else [])
        + [scspec]
        + [
            pl.BlockSpec((c, w.shape[1]), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq.shape[1]), const(0, 0), memory_space=pltpu.VMEM),
            wp_spec,
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wfc1.shape, const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wfc1.shape[1]), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wfc2.shape, const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n2, n2), const(0, 0, 0), memory_space=pltpu.VMEM),
        ]
    )

    args = [x] + [x] * len(x_nbr_specs)
    if extra is not None:
        args.append(extra.astype(dtype))
    args += [
        scales.astype(jnp.float32),
        w.astype(cdt), row(bq),
        wp_arr.astype(cdt), row(bp),
        row(g1.astype(jnp.float32)), row(b1.astype(jnp.float32)),
        row(g2.astype(jnp.float32)), row(b2.astype(jnp.float32)),
        wfc1.astype(cdt), row(bfc1.astype(jnp.float32)),
        wfc2.astype(cdt), row(bfc2.astype(jnp.float32)),
        rpb,
    ]

    if mask is not None:
        # [nW, N, N] window-row-major -> [nwh, nww, N, N]; the strip at
        # grid (b, r, cc) covers window rows [r*P, (r+1)*P) in column cc.
        mask4 = np.asarray(mask, np.float32).reshape(nwh, nww, n, n)
        if use_exp2:
            mask4 = mask4 * float(_LOG2E)
        # paired: row r2 holds blockdiag(mask of window row pairw*r2+i)
        mask4 = _pair_mask_blockdiag(mask4, pairw, n, axis=0)
        in_specs.append(
            pl.BlockSpec(
                (p // pairw, 1, n2, n2),
                lambda bb, r, cc: (r, cc, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.asarray(mask4))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, p * ws, ws, c), omap, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(*args)
    if fold:
        out = out.reshape(2 * b, hh // 2, www, c)
        if pad_sample:
            out = out[: 2 * b - pad_sample]
    return out


def _mega_backward(ct, x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                   wfc1, bfc1, wfc2, bfc2, bias, scales,
                   ws, mask, scale, gelu_approx, interpret, has_extra,
                   extra=None, max_p=16):
    """Pallas backward of the megakernel.  Returns grads in RAW weight
    space, ordered like fused_swin_block's op args (+ dextra last when
    has_extra).  The jnp-vjp path (vjp of _reference_block) costs ~3x
    the round-1 einsum forward on TPU because XLA rematerializes the
    [nW, N, N] attention tensors in HBM; this kernel keeps the whole
    recompute+chain in VMEM per strip and accumulates weight grads
    across grid steps in constant-index output blocks."""
    b, hh, www, c = x.shape
    nh = bias.shape[0]
    nwh, nww = hh // ws, www // ws
    n = ws * ws
    p = 1
    for cand in range(min(max_p, nwh), 0, -1):
        if nwh % cand == 0 and cand * n <= 1024:
            p = cand
            break
    nchunks = nwh // p

    w, bq, wp, bp, hdp = _prep_weights(wqkv, bqkv, wproj, bproj, nh, scale)
    hd = c // nh

    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1)
    h2 = wfc1.shape[1]

    kernel = functools.partial(
        _bwd_kernel, num_heads=nh, hdp=hdp, ws=ws, p=p, c=c, cdt=cdt,
        gelu_approx=gelu_approx,
        has_extra=has_extra, has_mask=mask is not None,
    )

    grid = (b, nchunks, nww)
    xmap = lambda bb, r, cc: (bb, r, cc, 0)
    const = lambda nd: (lambda bb, r, cc: tuple([0] * nd))
    xspec = pl.BlockSpec((1, p * ws, ws, c), xmap, memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, const(len(shape)), memory_space=pltpu.VMEM
    )

    in_specs = [xspec, xspec] + ([xspec] if has_extra else []) + [
        full((b, 2))] + [
        full((c, w.shape[1])), full((1, bq.shape[1])),
        full((wp.shape[0], c)), full((1, c)),
        full((1, c)), full((1, c)), full((1, c)), full((1, c)),
        full(wfc1.shape), full((1, h2)),
        full(wfc2.shape), full((1, c)),
        full((nh, n, n)),
    ]
    args = [ct.astype(dtype), x] + (
        [extra.astype(dtype)] if has_extra else []
    ) + [
        scales.astype(jnp.float32),
        w.astype(cdt), row(bq),
        wp.astype(cdt), row(bp),
        row(g1.astype(jnp.float32)), row(b1.astype(jnp.float32)),
        row(g2.astype(jnp.float32)), row(b2.astype(jnp.float32)),
        wfc1.astype(cdt), row(bfc1.astype(jnp.float32)),
        wfc2.astype(cdt), row(bfc2.astype(jnp.float32)),
        bias.astype(jnp.float32),
    ]
    if mask is not None:
        mask4 = np.asarray(mask, np.float32).reshape(nwh, nww, n, n)
        in_specs.append(
            pl.BlockSpec(
                (p, 1, n, n),
                lambda bb, r, cc: (r, cc, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.asarray(mask4))

    f32 = jnp.float32
    out_specs = [xspec] + ([xspec] if has_extra else []) + [
        full((c, w.shape[1])), full((1, bq.shape[1])),
        full((wp.shape[0], c)), full((1, c)),
        full((1, c)), full((1, c)), full((1, c)), full((1, c)),
        full(wfc1.shape), full((1, h2)),
        full(wfc2.shape), full((1, c)),
        full((nh, n, n)),
    ]
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, dtype)]
        + ([jax.ShapeDtypeStruct(x.shape, dtype)] if has_extra else [])
        + [
            jax.ShapeDtypeStruct((c, w.shape[1]), f32),
            jax.ShapeDtypeStruct((1, bq.shape[1]), f32),
            jax.ShapeDtypeStruct((wp.shape[0], c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct(wfc1.shape, f32),
            jax.ShapeDtypeStruct((1, h2), f32),
            jax.ShapeDtypeStruct(wfc2.shape, f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((nh, n, n), f32),
        ]
    )

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    res = list(res)
    dx = res.pop(0)
    dextra = res.pop(0) if has_extra else None
    (dw, dbq, dwp, dbp, dg1, db1, dg2, db2,
     dwfc1, dbfc1, dwfc2, dbfc2, drpb) = res
    # branch_scales are stochastic-depth bernoulli draws, never
    # parameters — their (unused) cotangent is returned as zeros.
    dsc = jnp.zeros((b, 2), f32)

    # prepped -> raw weight space (q pre-scale and head-dim padding)
    dw4 = dw.reshape(c, 3, nh, hdp)[..., :hd]
    dw4 = dw4.at[:, 0].multiply(scale)
    dwqkv = dw4.reshape(c, 3 * c)
    dbq3 = dbq.reshape(3, nh, hdp)[..., :hd]
    dbq3 = dbq3.at[0].multiply(scale)
    dbqkv = dbq3.reshape(3 * c)
    dwproj = dwp.reshape(nh, hdp, c)[:, :hd].reshape(c, c)
    grads = (
        dx, dg1[0], db1[0], dwqkv, dbqkv, dwproj, dbp[0],
        dg2[0], db2[0], dwfc1, dbfc1[0], dwfc2, dbfc2[0], drpb, dsc,
    )
    return grads + ((dextra,) if has_extra else ())


def fused_swin_block(
    x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
    wfc1, bfc1, wfc2, bfc2, bias,
    ws, mask=None, scale=1.0, gelu_approx=True, interpret=None,
    extra=None, branch_scales=None, variant=None, read_shift=0,
):
    """Full Swin transformer block on a (pre-rolled) [B, H, W, C] map.

    `read_shift` (ABSORB_ROLLS): read the input at a (read_shift,
    read_shift) cyclic spatial offset inside the kernel instead of the
    caller rolling the array — the output stays in the block's compute
    coordinates (the caller tracks them; see SwinBlock/RSTB).
    Differentiable: f_rs(x) == f(cyclic_shift(x, read_shift)), so the
    custom backward rolls the saved input into compute coordinates,
    reuses the standard block backward, and rolls dx back (the two
    rolls live only in the backward — the forward stays absorbed).

    Requires H % ws == 0 and W % ws == 0 (callers reflect-pad — the
    model already guarantees window multiples).  Differentiable via
    custom_vjp over the jnp reference composition.

    `extra` (optional, [B, H, W, C], same rolled domain as `x`) is added
    onto the attention residual inside the kernel: x1 = x + attn + extra.
    HAT's HAB uses it for the conv_scale-weighted CAB branch
    (hat_arch.py:307-308) so the whole hybrid block still runs as one
    Pallas program.

    `branch_scales` (optional, [B, 2] fp32) multiplies the attention and
    MLP residual branches per sample: x1 = x + s[:,0]*attn (+ extra),
    out = x1 + s[:,1]*mlp.  Stochastic depth (hat_arch.py:12-38) passes
    mask/keep values in {0, 1/keep} so training keeps the fused kernel;
    None means 1.0 (inference).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Sample folding is valid only when the per-sample branch scales are
    # statically all-ones (folded sample pairs share one scales row):
    # callers signal that by passing branch_scales=None.
    allow_fold = branch_scales is None and ALLOW_FOLD
    if branch_scales is None:
        branch_scales = jnp.ones((x.shape[0], 2), jnp.float32)
    vkw = _variant_kwargs(MEGA_VARIANT if variant is None else variant)
    vkw["allow_fold"] = allow_fold

    if read_shift:
        assert extra is None, "read_shift does not support `extra`"
        rs = read_shift

        @jax.custom_vjp
        def op_rs(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias, scales):
            return _mega_forward(
                x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                wfc1, bfc1, wfc2, bfc2, bias, scales,
                ws, mask, scale, gelu_approx, interpret,
                read_shift=rs, **vkw,
            )

        def op_rs_fwd(*args):
            return op_rs(*args), args

        def op_rs_bwd(res, ct):
            # The absorbed read is a pre-roll folded into the kernel:
            # f_rs(x) == f(cyclic_shift(x, rs)).  Differentiate the
            # equivalent pre-rolled composition and roll dx back
            # (vjp of roll(·, -s) is roll(·, +s)).
            from tpu_superresolution_tpu.ops.window import (
                cyclic_shift, cyclic_unshift,
            )

            res_s = (cyclic_shift(res[0], rs),) + tuple(res[1:])
            if KERNEL_BACKWARD and res[4] is not None:
                grads = _mega_backward(
                    ct, *res_s, ws, mask, scale, gelu_approx, interpret,
                    has_extra=False,
                )
            else:
                _, vjp = jax.vjp(
                    lambda *a: _reference_block(
                        *a, ws, mask, scale, gelu_approx
                    ),
                    *res_s,
                )
                grads = vjp(ct.astype(res_s[0].dtype))
            return (cyclic_unshift(grads[0], rs),) + tuple(grads[1:])

        op_rs.defvjp(op_rs_fwd, op_rs_bwd)
        return op_rs(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                     wfc1, bfc1, wfc2, bfc2, bias, branch_scales)

    if extra is None:

        @jax.custom_vjp
        def op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
               wfc1, bfc1, wfc2, bfc2, bias, scales):
            return _mega_forward(
                x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                wfc1, bfc1, wfc2, bfc2, bias, scales,
                ws, mask, scale, gelu_approx, interpret, **vkw,
            )

        def op_fwd(*args):
            return op(*args), args

        def op_bwd(res, ct):
            if KERNEL_BACKWARD and res[4] is not None:
                return _mega_backward(
                    ct, *res, ws, mask, scale, gelu_approx, interpret,
                    has_extra=False,
                )
            _, vjp = jax.vjp(
                lambda *a: _reference_block(*a, ws, mask, scale, gelu_approx),
                *res,
            )
            return vjp(ct.astype(res[0].dtype))

        op.defvjp(op_fwd, op_bwd)
        return op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias, branch_scales)

    @jax.custom_vjp
    def op_ex(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
              wfc1, bfc1, wfc2, bfc2, bias, scales, extra):
        return _mega_forward(
            x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
            wfc1, bfc1, wfc2, bfc2, bias, scales,
            ws, mask, scale, gelu_approx, interpret, extra=extra, **vkw,
        )

    def op_ex_fwd(*args):
        return op_ex(*args), args

    def op_ex_bwd(res, ct):
        if KERNEL_BACKWARD and res[4] is not None:
            return _mega_backward(
                ct, *res[:15], ws, mask, scale, gelu_approx, interpret,
                has_extra=True, extra=res[15],
            )
        _, vjp = jax.vjp(
            lambda *a: _reference_block(
                *a[:15], ws, mask, scale, gelu_approx, extra=a[15]
            ),
            *res,
        )
        return vjp(ct.astype(res[0].dtype))

    op_ex.defvjp(op_ex_fwd, op_ex_bwd)
    return op_ex(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                 wfc1, bfc1, wfc2, bfc2, bias, branch_scales, extra)


# ---------------------------------------------------------------------------
# Packed-window megakernel: same fused block (LN1 -> qkv -> masked window
# attention -> proj -> residual(+extra) -> LN2 -> MLP -> residual) on
# PRE-PARTITIONED window tokens [B*nWpad, N, C].  This is the path for
# window sizes whose strips cannot tile on Mosaic (HAT's ws=7 — see
# megakernel_tpu_ok): the caller pays XLA window_partition/reverse and
# token/window padding, but every elementwise/GEMM stage of the block
# still runs in one Pallas program per G-window block.
# ---------------------------------------------------------------------------


def _reference_packed(x, g1, b1, wqkv, bqkv, wproj, bproj,
                      g2, b2, wfc1, bfc1, wfc2, bfc2, bias, scales,
                      mask, scale, gelu_approx, extra=None):
    """jnp oracle/vjp for the packed megakernel.  x: [B*nWpad, N, C];
    scales [B, 2] broadcast per image (nWpad = bw // B)."""
    from tpu_superresolution_tpu.ops.pallas.fused_attention import (
        _reference_impl,
    )

    bw, n, c = x.shape
    b = scales.shape[0]
    nwpad = bw // b
    m1 = jnp.repeat(scales[:, 0], nwpad)[:, None, None].astype(jnp.float32)
    m2 = jnp.repeat(scales[:, 1], nwpad)[:, None, None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = _ln(xf, g1, b1).astype(x.dtype)
    attn = _reference_impl(
        y, wqkv, bqkv, wproj, bproj, bias, mask, scale
    ).astype(jnp.float32)
    x1 = xf + attn * m1
    if extra is not None:
        x1 = x1 + extra.astype(jnp.float32)
    y2 = _ln(x1, g2, b2).astype(x.dtype)
    h1 = y2 @ wfc1.astype(x.dtype) + bfc1.astype(x.dtype)
    h1 = _gelu(h1.astype(jnp.float32), gelu_approx).astype(x.dtype)
    mlp = h1 @ wfc2.astype(x.dtype) + bfc2.astype(x.dtype)
    out = x1 + mlp.astype(jnp.float32) * m2
    return out.astype(x.dtype)


def _packed_specs(bw, n, c, b, group, mask, w, bq, wp, wfc1, wfc2, nh):
    nwpad = bw // b
    sample_blocks = nwpad // group
    grid = (bw // group,)
    xspec = pl.BlockSpec(
        (group, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scspec = pl.BlockSpec(
        (b, 2), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, (lambda i: tuple([0] * len(shape))), memory_space=pltpu.VMEM
    )
    wspecs = [
        full((c, w.shape[1])), full((1, bq.shape[1])),
        full((wp.shape[0], c)), full((1, c)),
        full((1, c)), full((1, c)), full((1, c)), full((1, c)),
        full(wfc1.shape), full((1, wfc1.shape[1])),
        full(wfc2.shape), full((1, c)),
        full((nh, n, n)),
    ]
    mspec = None
    if mask is not None:
        mspec = pl.BlockSpec(
            (group, n, n),
            lambda i: (i % sample_blocks, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return grid, xspec, scspec, wspecs, mspec, sample_blocks, full


def _packed_forward(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                    wfc1, bfc1, wfc2, bfc2, bias, scales,
                    mask, scale, gelu_approx, interpret, extra=None,
                    group=8, variant=None):
    bw, n, c = x.shape
    b = scales.shape[0]
    nh = bias.shape[0]
    vkw = _variant_kwargs(PACKED_VARIANT if variant is None else variant)
    use_exp2, stackv = vkw["use_exp2"], vkw["stackv"]
    # Window pairing (same block-diagonal trick as the strip path):
    # consecutive windows in a group share one [pairw*N, pairw*N] score
    # block, cutting the count of tiny batched matmuls in the serial
    # per-step chain by pairw at the cost of pairw x score FLOPs (the
    # -1e9 off-diagonal entries).  HAT's packed path is latency-bound
    # on exactly that chain (PARITY.md round 3).
    pairw = vkw["pairw"]
    if group % pairw:
        pairw = 1
    n2 = n * pairw
    w, bq, wp, bp, hdp, bias_eff = _prep_variant_weights(
        wqkv, bqkv, wproj, bproj, nh, c, scale, bias, use_exp2, pairw, n
    )
    hd = c // nh
    hdp_qk = None
    if PACKED_QK_NOPAD and hdp > hd:
        # Re-pack [C, 3*nh*hdp] -> [C, nh*hd | nh*hd | nh*hdp]: q/k drop
        # their zero pad lanes, v keeps hdp (ones-column at lane hd).
        koff = nh * hdp
        qk_cols = np.concatenate(
            [np.arange(h * hdp, h * hdp + hd) for h in range(nh)]
        )
        cols = np.concatenate(
            [qk_cols, koff + qk_cols, 2 * koff + np.arange(koff)]
        )
        w = w[:, cols]
        bq = bq[:, cols]
        hdp_qk = hd
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1)
    grid, xspec, scspec, wspecs, mspec, sample_blocks, full = _packed_specs(
        bw, n, c, b, group, mask, w, bq, wp, wfc1, wfc2, nh
    )
    if pairw > 1:
        wspecs[-1] = full((nh, n2, n2))
        if mask is not None:
            mspec = pl.BlockSpec(
                (group // pairw, n2, n2),
                lambda i: (i % sample_blocks, 0, 0),
                memory_space=pltpu.VMEM,
            )
    if stackv:
        wp_arr = wp.reshape(nh, hdp, c)
        wspecs[2] = full((nh, hdp, c))
    else:
        wp_arr = wp
    kernel = functools.partial(
        _kernel, num_heads=nh, hdp=hdp, ws=0, p=group, c=c, cdt=cdt,
        gelu_approx=gelu_approx,
        has_extra=extra is not None, has_mask=mask is not None,
        n=n, sample_blocks=sample_blocks,
        use_exp2=use_exp2, pairw=pairw, stackv=stackv, hdp_qk=hdp_qk,
    )
    in_specs = (
        [xspec]
        + ([xspec] if extra is not None else [])
        + [scspec]
        + wspecs
    )
    args = [x]
    if extra is not None:
        args.append(extra.astype(dtype))
    args += [
        scales.astype(jnp.float32),
        w.astype(cdt), row(bq),
        wp_arr.astype(cdt), row(bp),
        row(g1.astype(jnp.float32)), row(b1.astype(jnp.float32)),
        row(g2.astype(jnp.float32)), row(b2.astype(jnp.float32)),
        wfc1.astype(cdt), row(bfc1.astype(jnp.float32)),
        wfc2.astype(cdt), row(bfc2.astype(jnp.float32)),
        bias_eff,
    ]
    if mask is not None:
        in_specs.append(mspec)
        m_np = np.asarray(mask, np.float32)
        if use_exp2:
            m_np = m_np * float(_LOG2E)
        # blockdiag(mask of windows pairw*j + i): consecutive windows
        # of the padded stream share one score block
        m_np = _pair_mask_blockdiag(m_np, pairw, n, axis=0)
        args.append(jnp.asarray(m_np))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(*args)


def _spatial_forward(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                     wfc1, bfc1, wfc2, bfc2, bias, scales, ws,
                     mask, scale, gelu_approx, interpret, extra=None,
                     variant=None):
    """Packed-block forward reading window-ROW strips (1, ws, W, C)
    straight from the spatial array — no XLA window partition, token
    pad or window-count pad.  Any ws is Mosaic-legal here because the
    x block's last two dims equal the array dims; the window-major
    rearrangement happens in VMEM (_kernel's spatial mode)."""
    b, h, w_, c = x.shape
    assert h % ws == 0 and w_ % ws == 0, (h, w_, ws)
    nwh, nww = h // ws, w_ // ws
    n = ws * ws
    nh = bias.shape[0]
    vkw = _variant_kwargs(PACKED_VARIANT if variant is None else variant)
    use_exp2, stackv = vkw["use_exp2"], vkw["stackv"]
    pairw = vkw["pairw"]
    if nww % pairw:
        pairw = 1
    n2 = n * pairw
    w, bq, wp, bp, hdp, bias_eff = _prep_variant_weights(
        wqkv, bqkv, wproj, bproj, nh, c, scale, bias, use_exp2, pairw, n
    )
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1)

    grid = (b, nwh)
    xspec = pl.BlockSpec(
        (1, ws, w_, c), lambda bb, r: (bb, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scspec = pl.BlockSpec(
        (b, 2), lambda bb, r: (0, 0), memory_space=pltpu.SMEM
    )
    const = lambda *shape: (lambda bb, r: tuple([0] * len(shape)))
    full = lambda shape: pl.BlockSpec(
        shape, const(*shape), memory_space=pltpu.VMEM
    )
    if stackv:
        wp_arr = wp.reshape(nh, hdp, c)
        wp_spec = full((nh, hdp, c))
    else:
        wp_arr = wp
        wp_spec = full((wp.shape[0], c))
    wspecs = [
        full((c, w.shape[1])), full((1, bq.shape[1])),
        wp_spec, full((1, c)),
        full((1, c)), full((1, c)), full((1, c)), full((1, c)),
        full(wfc1.shape), full((1, wfc1.shape[1])),
        full(wfc2.shape), full((1, c)),
        full((nh, n2, n2)),
    ]
    kernel = functools.partial(
        _kernel, num_heads=nh, hdp=hdp, ws=0, p=nww, c=c, cdt=cdt,
        gelu_approx=gelu_approx,
        has_extra=extra is not None, has_mask=mask is not None,
        n=n, sample_blocks=0,
        use_exp2=use_exp2, pairw=pairw, stackv=stackv, spatial_ws=ws,
    )
    in_specs = (
        [xspec]
        + ([xspec] if extra is not None else [])
        + [scspec]
        + wspecs
    )
    args = [x]
    if extra is not None:
        args.append(extra.astype(dtype))
    args += [
        scales.astype(jnp.float32),
        w.astype(cdt), row(bq),
        wp_arr.astype(cdt), row(bp),
        row(g1.astype(jnp.float32)), row(b1.astype(jnp.float32)),
        row(g2.astype(jnp.float32)), row(b2.astype(jnp.float32)),
        wfc1.astype(cdt), row(bfc1.astype(jnp.float32)),
        wfc2.astype(cdt), row(bfc2.astype(jnp.float32)),
        bias_eff,
    ]
    if mask is not None:
        # [nW, N, N] window-major -> [nwh, nww, N, N]; row r streams its
        # own window-row of masks (optionally pair-blockdiag'd on the
        # window-column axis)
        m_np = np.asarray(mask, np.float32).reshape(nwh, nww, n, n)
        if use_exp2:
            m_np = m_np * float(_LOG2E)
        m_np = _pair_mask_blockdiag(m_np, pairw, n, axis=1)
        in_specs.append(
            pl.BlockSpec(
                (1,) + m_np.shape[1:],
                lambda bb, r: (r, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.asarray(m_np))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(*args)


def _packed_backward(ct, x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                     wfc1, bfc1, wfc2, bfc2, bias, scales,
                     mask, scale, gelu_approx, interpret, has_extra,
                     extra=None, group=8):
    bw, n, c = x.shape
    b = scales.shape[0]
    nh = bias.shape[0]
    w, bq, wp, bp, hdp = _prep_weights(wqkv, bqkv, wproj, bproj, nh, scale)
    hd = c // nh
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1)
    h2 = wfc1.shape[1]
    grid, xspec, scspec, wspecs, mspec, sample_blocks, full = _packed_specs(
        bw, n, c, b, group, mask, w, bq, wp, wfc1, wfc2, nh
    )
    kernel = functools.partial(
        _bwd_kernel, num_heads=nh, hdp=hdp, ws=0, p=group, c=c, cdt=cdt,
        gelu_approx=gelu_approx,
        has_extra=has_extra, has_mask=mask is not None,
        n=n, sample_blocks=sample_blocks, grid_rank=1,
    )
    in_specs = [xspec, xspec] + ([xspec] if has_extra else []) + [
        scspec
    ] + wspecs
    args = [ct.astype(dtype), x] + (
        [extra.astype(dtype)] if has_extra else []
    ) + [
        scales.astype(jnp.float32),
        w.astype(cdt), row(bq),
        wp.astype(cdt), row(bp),
        row(g1.astype(jnp.float32)), row(b1.astype(jnp.float32)),
        row(g2.astype(jnp.float32)), row(b2.astype(jnp.float32)),
        wfc1.astype(cdt), row(bfc1.astype(jnp.float32)),
        wfc2.astype(cdt), row(bfc2.astype(jnp.float32)),
        bias.astype(jnp.float32),
    ]
    if mask is not None:
        in_specs.append(mspec)
        args.append(jnp.asarray(np.asarray(mask, np.float32)))

    f32 = jnp.float32
    out_specs = [xspec] + ([xspec] if has_extra else []) + wspecs
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, dtype)]
        + ([jax.ShapeDtypeStruct(x.shape, dtype)] if has_extra else [])
        + [
            jax.ShapeDtypeStruct((c, w.shape[1]), f32),
            jax.ShapeDtypeStruct((1, bq.shape[1]), f32),
            jax.ShapeDtypeStruct((wp.shape[0], c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct(wfc1.shape, f32),
            jax.ShapeDtypeStruct((1, h2), f32),
            jax.ShapeDtypeStruct(wfc2.shape, f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((nh, n, n), f32),
        ]
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    res = list(res)
    dx = res.pop(0)
    dextra = res.pop(0) if has_extra else None
    (dw, dbq, dwp, dbp, dg1, db1, dg2, db2,
     dwfc1, dbfc1, dwfc2, dbfc2, drpb) = res
    dsc = jnp.zeros((b, 2), f32)
    dw4 = dw.reshape(c, 3, nh, hdp)[..., :hd]
    dw4 = dw4.at[:, 0].multiply(scale)
    dwqkv = dw4.reshape(c, 3 * c)
    dbq3 = dbq.reshape(3, nh, hdp)[..., :hd]
    dbq3 = dbq3.at[0].multiply(scale)
    dbqkv = dbq3.reshape(3 * c)
    dwproj = dwp.reshape(nh, hdp, c)[:, :hd].reshape(c, c)
    grads = (
        dx, dg1[0], db1[0], dwqkv, dbqkv, dwproj, dbp[0],
        dg2[0], db2[0], dwfc1, dbfc1[0], dwfc2, dbfc2[0], drpb, dsc,
    )
    return grads + ((dextra,) if has_extra else ())


def fused_packed_windows_block(
    x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
    wfc1, bfc1, wfc2, bfc2, bias,
    mask=None, scale=1.0, gelu_approx=True, interpret=None,
    extra=None, branch_scales=None, group=None, variant=None,
):
    """Fused transformer block on pre-partitioned windows.

    x: [B*nWpad, N, C] window tokens — N must be a multiple of 8 (token
    padding with -1e9 bias columns is the caller's job, as is window-
    count padding so nWpad % group == 0).  bias: [nH, N, N];
    mask: numpy [nWpad, N, N] or None; branch_scales: [B, 2] or None;
    extra: same shape as x (HAT's CAB branch, pre-partitioned).
    Differentiable: Pallas backward kernel (jnp-vjp fallback when
    KERNEL_BACKWARD=False or bqkv is None).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if group is None:
        group = PACKED_GROUP
    bw = x.shape[0]
    if branch_scales is None:
        branch_scales = jnp.ones((1, 2), jnp.float32)
    b = branch_scales.shape[0]
    # group must divide the per-sample window count; halve down for
    # callers that padded to a smaller multiple (everyone pads to >=8)
    while group > 1 and (bw // b) % group:
        group //= 2
    assert bw % (b * group) == 0, (bw, b, group)

    if extra is None:

        @jax.custom_vjp
        def op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
               wfc1, bfc1, wfc2, bfc2, bias, scales):
            return _packed_forward(
                x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                wfc1, bfc1, wfc2, bfc2, bias, scales,
                mask, scale, gelu_approx, interpret, group=group,
                variant=variant,
            )

        def op_fwd(*args):
            return op(*args), args

        def op_bwd(res, ct):
            if KERNEL_BACKWARD and res[4] is not None:
                bgroup = min(group, PACKED_GROUP_BWD)
                while bgroup > 1 and (bw // b) % bgroup:
                    bgroup //= 2
                return _packed_backward(
                    ct, *res, mask, scale, gelu_approx, interpret,
                    has_extra=False, group=bgroup,
                )
            _, vjp = jax.vjp(
                lambda *a: _reference_packed(
                    *a, mask, scale, gelu_approx
                ),
                *res,
            )
            return vjp(ct.astype(res[0].dtype))

        op.defvjp(op_fwd, op_bwd)
        return op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias, branch_scales)

    @jax.custom_vjp
    def op_ex(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
              wfc1, bfc1, wfc2, bfc2, bias, scales, extra):
        return _packed_forward(
            x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
            wfc1, bfc1, wfc2, bfc2, bias, scales,
            mask, scale, gelu_approx, interpret, extra=extra, group=group,
            variant=variant,
        )

    def op_ex_fwd(*args):
        return op_ex(*args), args

    def op_ex_bwd(res, ct):
        if KERNEL_BACKWARD and res[4] is not None:
            bgroup = min(group, PACKED_GROUP_BWD)
            while bgroup > 1 and (bw // b) % bgroup:
                bgroup //= 2
            return _packed_backward(
                ct, *res[:15], mask, scale, gelu_approx, interpret,
                has_extra=True, extra=res[15], group=bgroup,
            )
        _, vjp = jax.vjp(
            lambda *a: _reference_packed(
                *a[:15], mask, scale, gelu_approx, extra=a[15]
            ),
            *res,
        )
        return vjp(ct.astype(res[0].dtype))

    op_ex.defvjp(op_ex_fwd, op_ex_bwd)
    return op_ex(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                 wfc1, bfc1, wfc2, bfc2, bias, branch_scales, extra)


def _reference_spatial(x, g1, b1, wqkv, bqkv, wproj, bproj,
                       g2, b2, wfc1, bfc1, wfc2, bfc2, bias, scales, ws,
                       mask, scale, gelu_approx, extra=None):
    """jnp oracle for the spatial packed block: XLA partition ->
    _reference_packed -> reverse."""
    from tpu_superresolution_tpu.ops.window import (
        window_partition,
        window_reverse,
    )

    b, h, w_, c = x.shape
    xw = window_partition(x, ws)
    ew = None if extra is None else window_partition(extra, ws)
    out = _reference_packed(
        xw, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
        wfc1, bfc1, wfc2, bfc2, bias, scales,
        mask, scale, gelu_approx, extra=ew,
    )
    return window_reverse(out, ws, h, w_)


def fused_spatial_windows_block(
    x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
    wfc1, bfc1, wfc2, bfc2, bias, ws,
    mask=None, scale=1.0, gelu_approx=True, interpret=None,
    extra=None, branch_scales=None, variant=None,
):
    """Fused transformer block on SPATIAL input for ws%8!=0 windows.

    x: [B, H, W, C] with H % ws == 0 and W % ws == 0 (HAT pads via
    check_image_size before the residual groups — hat_arch.py:870).
    mask: [nW, N, N] trace-time table (shift_attn_mask) or None.

    Forward: one Pallas program per (sample, window-row) reading a
    (1, ws, W, C) block — no XLA window partition / token pad /
    window-count pad (those copies cost the classic packed path
    several ms per HAT forward; PARITY.md round 3).  Backward: XLA
    partition + the packed Pallas backward + reverse (same cost as
    the classic path's training step).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w_, c = x.shape
    n = ws * ws
    nW = (h // ws) * (w_ // ws)
    if branch_scales is None:
        branch_scales = jnp.ones((b, 2), jnp.float32)

    def bwd_packed(res_x, res_extra, ct, weights, scales):
        # Mirror the classic packed path's padding, then reuse
        # _packed_backward; map x/extra/rpb grads back to spatial.
        from tpu_superresolution_tpu.ops.window import (
            window_partition,
            window_reverse,
        )

        (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
         wfc1, bfc1, wfc2, bfc2, bias) = weights
        group = PACKED_GROUP_BWD  # group-16 bwd OOMs scoped VMEM
        npad = (-n) % 8
        wpad = (-nW) % group  # pads nW + wpad to a group multiple

        def part(a):
            aw = window_partition(a, ws).reshape(b, nW, n, c)
            if wpad or npad:
                aw = jnp.pad(aw, ((0, 0), (0, wpad), (0, npad), (0, 0)))
            return aw.reshape(b * (nW + wpad), n + npad, c)

        bias_p = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, npad), (0, npad)), constant_values=-1e9,
        )
        mask_p = None
        if mask is not None:
            mask_p = np.pad(
                np.asarray(mask, np.float32),
                ((0, wpad), (0, npad), (0, npad)),
            )
        grads = _packed_backward(
            part(ct), part(res_x), g1, b1, wqkv, bqkv, wproj, bproj,
            g2, b2, wfc1, bfc1, wfc2, bfc2, bias_p, scales,
            mask_p, scale, gelu_approx, interpret,
            has_extra=res_extra is not None,
            extra=None if res_extra is None else part(res_extra),
            group=group,
        )

        def unpart(a):
            a4 = a.reshape(b, nW + wpad, n + npad, c)[:, :nW, :n]
            return window_reverse(a4.reshape(b * nW, n, c), ws, h, w_)

        grads = list(grads)
        grads[0] = unpart(grads[0])
        grads[13] = grads[13][:, :n, :n]  # rpb pad slice
        if res_extra is not None:
            grads[15] = unpart(grads[15])
        return tuple(grads)

    if extra is None:

        @jax.custom_vjp
        def op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
               wfc1, bfc1, wfc2, bfc2, bias, scales):
            return _spatial_forward(
                x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                wfc1, bfc1, wfc2, bfc2, bias, scales, ws,
                mask, scale, gelu_approx, interpret, variant=variant,
            )

        def op_fwd(*args):
            return op(*args), args

        def op_bwd(res, ct):
            if KERNEL_BACKWARD and res[4] is not None:
                return bwd_packed(res[0], None, ct, res[1:14], res[14])
            _, vjp = jax.vjp(
                lambda *a: _reference_spatial(
                    *a, ws, mask, scale, gelu_approx
                ),
                *res,
            )
            return vjp(ct.astype(res[0].dtype))

        op.defvjp(op_fwd, op_bwd)
        return op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias, branch_scales)

    @jax.custom_vjp
    def op_ex(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
              wfc1, bfc1, wfc2, bfc2, bias, scales, extra):
        return _spatial_forward(
            x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
            wfc1, bfc1, wfc2, bfc2, bias, scales, ws,
            mask, scale, gelu_approx, interpret, extra=extra,
            variant=variant,
        )

    def op_ex_fwd(*args):
        return op_ex(*args), args

    def op_ex_bwd(res, ct):
        if KERNEL_BACKWARD and res[4] is not None:
            return bwd_packed(res[0], res[15], ct, res[1:14], res[14])
        _, vjp = jax.vjp(
            lambda *a: _reference_spatial(
                *a[:15], ws, mask, scale, gelu_approx, extra=a[15]
            ),
            *res,
        )
        return vjp(ct.astype(res[0].dtype))

    op_ex.defvjp(op_ex_fwd, op_ex_bwd)
    return op_ex(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                 wfc1, bfc1, wfc2, bfc2, bias, branch_scales, extra)

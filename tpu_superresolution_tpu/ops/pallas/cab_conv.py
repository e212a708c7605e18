"""Fused CAB front half: LayerNorm -> conv3x3 -> exact GELU -> conv3x3
in ONE Pallas program.

Why: HAT's CAB branch (reference hat_arch.py:62-75, consumed at :307)
runs on the full spatial map between Pallas megakernel calls.  Even
with the convs as 9-shifted GEMMs each op is a separate XLA stage that
reads/writes the whole map through HBM — the two convs alone re-read
the padded activation 9x each, and the LN feed is another full
read+write.  This kernel streams the map ONCE: row chunks with a
±2-row halo (conv->conv needs 2), LN/conv/gelu/conv all in VMEM,
writing only the final conv2 output.  The SE gate (ChannelAttention)
stays in XLA — it needs a global mean and measured free (PARITY.md
round 3).

Halo mechanics: three input refs alias the same array with clamped
index maps (prev/cur/next row chunk); out-of-image halo rows are
select-masked to zero, matching the reference's SAME zero padding
applied to the LN output.  Block last-two dims are (W, C) = the full
array dims, so any H/W tiles on Mosaic.

Backward: jax.vjp over the jnp reference chain (cheap ops — XLA
autodiff here is exactly the pre-fusion cost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_superresolution_tpu.ops.pallas.fused_block import _gelu, _ln

__all__ = ["fused_ln_cab_convs", "conv3x3_halo", "ENABLE"]

# Routing switch for HAB's fused path (A/B on hardware before default).
ENABLE = False

# Rows per grid step (upper bound).  VMEM per step ~ 3 x-chunks + fp32
# temps; 32 rows at 259x96 bf16 is ~10 MB peak — but at 256^2 x C180
# (SwinIR-M whole-image) 32 rows needs ~17.6 MB and overflows the
# 16 MB scoped-VMEM stack ("Ran out of memory in memory space vmem",
# measured 2026-08-19) — every halo kernel now sizes its rows to
# _VMEM_BUDGET via _fit_rows.
CHUNK_ROWS = 32

# Backward reference for conv3x3_halo's custom vjp: "gemm"
# differentiates the 9-shifted-GEMM chain (9 transposed GEMMs), "xla"
# differentiates lax.conv (XLA's transposed-conv vjp).  Same math
# either way.  Measured 2026-08-19 (swinir_train_conv_ab, b8 64px x4
# dp0.1, same-day interleaved): xla-convs 74.59 / halo+gemm-bwd 76.97
# / halo+xla-bwd 74.98 ms median — the gemm backward cost the halo
# flip 2.4% on the train step; the xla backward recovers it to within
# noise while the halo forward keeps its inference win.
BWD_IMPL = "xla"

# Strict VMEM fit for the halo convs: refuse any shape whose
# UNCONSTRAINED pipeline block (32 rows) does not fit, instead of
# shrinking rows (estimate-shrunk rows ~10 still crashed the remote
# Mosaic at 256^2 x C180, mosaic_diag 2026-08-19).  The crash evidence
# is C=180-sized; smaller-C shapes (HAT CAB at C<=96) may compile at
# shrunk rows — A/B via experiments/hat_cab_halo_ab.py before
# relaxing per-shape.
STRICT = True

# Scoped-VMEM budget per grid step (bytes).  The hardware stack limit
# is 16 MB; the per-row estimates below count the pipeline blocks
# DOUBLE-buffered (Mosaic multi-buffers every in/out block of a
# pipelined grid — the first estimate missed this and rows sized to a
# 10 MiB budget still OOMed at 256^2, mosaic_diag 2026-08-19) plus the
# in-kernel fp32/cdt temps.
_VMEM_BUDGET = 15 * 2**20


def _fit_rows(h, per_row_bytes, min_rows, halo=2, strict=False):
    """Largest rows-per-step <= CHUNK_ROWS whose estimated live VMEM
    fits _VMEM_BUDGET; 0 when even `min_rows` (the halo requirement)
    can't fit — callers fall back to their jnp/XLA reference path.

    `halo` charges the constant extra temp rows ((rows+halo) concats /
    pads inside the kernel) against the budget so small-`rows` fits
    aren't dominated by the halo overhead they ignore.

    `strict`: return 0 unless the UNCONSTRAINED row count
    (min(CHUNK_ROWS, h)) fits — i.e. refuse VMEM-squeezed shapes
    entirely.  Measured 2026-08-19: SwinIR conv3x3-halo at 256^2 still
    crashes the remote Mosaic compiler with estimate-shrunk rows (~10),
    so the production halo convs only run where the full pipeline block
    fits comfortably (e.g. the 64px bench tiles); squeezed shapes take
    the XLA conv, which measured best at 256^2 anyway (46.52 vs
    gemm 52.16, conv_impl_ab)."""
    free = min(CHUNK_ROWS, h)
    rows = min(free, int(_VMEM_BUDGET // max(per_row_bytes, 1)) - halo)
    if rows < min_rows or (strict and rows < free):
        return 0
    return rows


def _kernel(xp_ref, xc_ref, xn_ref, g_ref, b_ref,
            k1_ref, c1_ref, k2_ref, c2_ref, o_ref,
            *, rows, h, w, cin, cmid, cout, cdt):
    r = pl.program_id(1)
    # rows [r*rows - 2, r*rows + rows + 2): 2-row halo each side
    x = jnp.concatenate(
        [xp_ref[0, rows - 2 :], xc_ref[0], xn_ref[0, :2]], axis=0
    )  # [rows+4, W, Cin]
    row0 = r * rows - 2
    rid = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 4, 1, 1), 0)
    valid = jnp.logical_and(rid >= 0, rid < h)

    xf = x.astype(jnp.float32).reshape(rows + 4, w * cin)
    ln = _ln(
        xf.reshape((rows + 4) * w, cin), g_ref[:], b_ref[:]
    ).reshape(rows + 4, w, cin)
    # Out-of-image halo rows become the reference's zero padding (select,
    # not multiply — clamped-duplicate chunks may hold arbitrary bits).
    ln = jnp.where(valid, ln, 0.0).astype(cdt)

    def conv(y, k_ref, c_ref, n_in, n_out, rows_out):
        # SAME 3x3 as 9 shifted GEMMs on the VMEM tile; y has one more
        # halo row each side than the output needs.
        rin = rows_out + 2
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = yp[dy : dy + rows_out, dx : dx + w].reshape(
                    rows_out * w, n_in
                )
                t = jax.lax.dot_general(
                    sl, k_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        del rin
        return (acc + c_ref[:]).reshape(rows_out, w, n_out)

    y1 = conv(ln, k1_ref, c1_ref, cin, cmid, rows + 2)
    y1 = _gelu(y1, False).astype(cdt)
    # conv2's SAME padding zeroes rows OUTSIDE the image of its input
    # (gelu(conv1(...))): the halo rows at global -1 / h computed above
    # are out-of-image positions and must be the pad value, not
    # conv1-of-zero-padding values.
    rid1 = row0 + 1 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    y1 = jnp.where(jnp.logical_and(rid1 >= 0, rid1 < h), y1, 0.0)
    y2 = conv(y1, k2_ref, c2_ref, cmid, cout, rows)
    o_ref[0] = y2.astype(o_ref.dtype)


def _reference(x, g, b, k1, c1, k2, c2):
    """jnp oracle / vjp: conv(gelu(conv(LN(x)))) with SAME zero pad on
    the LN output (matches torch conv2d padding=1 after norm)."""
    from tpu_superresolution_tpu.ops.conv_gemm import conv3x3_gemm

    dt = x.dtype
    bsz, h, w, c = x.shape
    ln = _ln(
        x.astype(jnp.float32).reshape(-1, c), g, b
    ).reshape(bsz, h, w, c).astype(dt)
    y = conv3x3_gemm(ln, k1, c1)
    y = _gelu(y.astype(jnp.float32), False).astype(dt)
    return conv3x3_gemm(y, k2, c2)


def _forward(x, g, b, k1, c1, k2, c2, interpret):
    bsz, h, w, cin = x.shape
    cmid = k1.shape[-1]
    cout = k2.shape[-1]
    xb = x.dtype.itemsize
    cb = 2 if x.dtype == jnp.bfloat16 else 4
    # per row: 3 input chunks double-buffered (6*xb) + concat/xf/ln
    # fp32 temps + ln cast/pad (cb) + conv1 acc (4) / y1+gelu (cb+4) +
    # conv2 acc (4) + out double-buffered (2*xb)
    per_row = w * (
        cin * (6 * xb + 10 + 2 * cb)
        + cmid * (8 + cb)
        + cout * (4 + 2 * xb)
    )
    rows = _fit_rows(h, per_row, min_rows=4, halo=4)
    if rows == 0:
        return _reference(x, g, b, k1, c1, k2, c2)
    nr = pl.cdiv(h, rows)
    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    cur = lambda bb, r: (bb, r, 0, 0)
    prv = lambda bb, r: (bb, jnp.maximum(r - 1, 0), 0, 0)
    nxt = lambda bb, r: (bb, jnp.minimum(r + 1, nr - 1), 0, 0)
    xblk = lambda m: pl.BlockSpec((1, rows, w, cin), m,
                                  memory_space=pltpu.VMEM)
    const = lambda *shape: (lambda bb, r: tuple([0] * len(shape)))
    full = lambda a: pl.BlockSpec(a.shape, const(*a.shape),
                                  memory_space=pltpu.VMEM)

    row2 = lambda a: a.astype(jnp.float32).reshape(1, -1)
    args = [
        x, x, x,
        row2(g), row2(b),
        k1.astype(cdt), row2(c1),
        k2.astype(cdt), row2(c2),
    ]
    kernel = functools.partial(
        _kernel, rows=rows, h=h, w=w, cin=cin, cmid=cmid, cout=cout,
        cdt=cdt,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, nr),
        in_specs=[
            xblk(prv), xblk(cur), xblk(nxt),
            full(args[3]), full(args[4]),
            full(args[5]), full(args[6]),
            full(args[7]), full(args[8]),
        ],
        out_specs=pl.BlockSpec((1, rows, w, cout), cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dtype),
        interpret=interpret,
    )(*args)


def _conv_kernel(xp_ref, xc_ref, xn_ref, k_ref, c_ref, o_ref,
                 *, rows, h, w, cin, cout, cdt):
    r = pl.program_id(1)
    x = jnp.concatenate(
        [xp_ref[0, rows - 1 :], xc_ref[0], xn_ref[0, :1]], axis=0
    )  # [rows+2, W, Cin] — ±1-row halo
    row0 = r * rows - 1
    rid = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    valid = jnp.logical_and(rid >= 0, rid < h)
    x = jnp.where(valid, x, 0).astype(cdt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[dy : dy + rows, dx : dx + w].reshape(rows * w, cin)
            t = jax.lax.dot_general(
                sl, k_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    o_ref[0] = (acc + c_ref[:]).astype(o_ref.dtype).reshape(rows, w, cout)


def conv3x3_halo(x, kernel, bias, interpret=None):
    """SAME 3x3 conv as ONE Pallas program streaming row chunks with a
    ±1-row halo — reads x once (the 9-shifted-GEMM form re-reads it 9x;
    the XLA conv op at B=1 between Pallas calls is ~30-40x its roofline
    in-model, PARITY.md round 3).  Same [3,3,Cin,Cout]+[Cout] layout as
    ``nn.Conv``; differentiable via jax.vjp of the GEMM reference."""
    from tpu_superresolution_tpu.ops.conv_gemm import conv3x3_gemm

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def conv_xla(x, kernel, bias):
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)

    def forward(x, kernel, bias):
        bsz, h, w, cin = x.shape
        cout = kernel.shape[-1]
        if (cin < 8 or w % 8 != 0) and not interpret:
            # Refuse the VMEM-unmodelable regimes: (a) image-input
            # convs (Cin=3) — the lane-padded (3 -> 128) per-tap
            # [rows*w, cin] reshapes are materialized copies; HAT's
            # 70x70x3 -> 96 conv_first compiled to a 17.15 MB
            # scoped-VMEM stack vs a ~1.8 MB estimate and crashed
            # remote Mosaic (2026-08-19); (b) sublane-unaligned widths
            # (HAT's ws=7 pads to w=70/259) — every tap slice/reshape
            # crosses tile boundaries and materializes relayouts the
            # estimate cannot see.  Every measured halo win is at
            # w in {64, 256}; the input-conv edge was ~0.5%.
            return conv_xla(x, kernel, bias)
        xb = x.dtype.itemsize
        cb = 2 if x.dtype == jnp.bfloat16 else 4
        # 3 input chunks double-buffered + concat/where/pad cdt copies
        # + fp32 acc + out double-buffered
        per_row = w * (cin * (6 * xb + 3 * cb) + cout * (4 + 2 * xb))
        rows = _fit_rows(h, per_row, min_rows=2, strict=STRICT)
        if rows == 0:
            # XLA conv beats the 9-shifted GEMM at VMEM-bound shapes
            # (46.52 vs 52.16 ms whole-SwinIR at 256^2, conv_impl_ab).
            return conv_xla(x, kernel, bias)
        nr = pl.cdiv(h, rows)
        dtype = x.dtype
        cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
        cur = lambda bb, r: (bb, r, 0, 0)
        prv = lambda bb, r: (bb, jnp.maximum(r - 1, 0), 0, 0)
        nxt = lambda bb, r: (bb, jnp.minimum(r + 1, nr - 1), 0, 0)
        xblk = lambda m: pl.BlockSpec((1, rows, w, cin), m,
                                      memory_space=pltpu.VMEM)
        const = lambda *shape: (lambda bb, r: tuple([0] * len(shape)))
        full = lambda a: pl.BlockSpec(a.shape, const(*a.shape),
                                      memory_space=pltpu.VMEM)
        kk = kernel.astype(cdt)
        cc_ = bias.astype(jnp.float32).reshape(1, -1)
        kfn = functools.partial(
            _conv_kernel, rows=rows, h=h, w=w, cin=cin, cout=cout, cdt=cdt,
        )
        return pl.pallas_call(
            kfn,
            grid=(bsz, nr),
            in_specs=[xblk(prv), xblk(cur), xblk(nxt), full(kk), full(cc_)],
            out_specs=pl.BlockSpec((1, rows, w, cout), cur,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dtype),
            interpret=interpret,
        )(x, x, x, kk, cc_)

    @jax.custom_vjp
    def op(x, kernel, bias):
        return forward(x, kernel, bias)

    def fwd(*a):
        return op(*a), a

    def bwd(res, ct):
        ref = conv3x3_gemm if BWD_IMPL == "gemm" else conv_xla
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(fwd, bwd)
    return op(x, kernel, bias)


def _convk_kernel(xp_ref, xc_ref, xn_ref, k_ref, c_ref, o_ref,
                  *, rows, h, w, cin, cout, cdt, kh, kw, plo, phi,
                  plo_w, phi_w):
    r = pl.program_id(1)
    parts = []
    if plo:
        parts.append(xp_ref[0, rows - plo :])
    parts.append(xc_ref[0])
    if phi:
        parts.append(xn_ref[0, :phi])
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    row0 = r * rows - plo
    rid = row0 + jax.lax.broadcasted_iota(
        jnp.int32, (rows + plo + phi, 1, 1), 0
    )
    x = jnp.where(jnp.logical_and(rid >= 0, rid < h), x, 0).astype(cdt)
    xp = jnp.pad(x, ((0, 0), (plo_w, phi_w), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = xp[dy : dy + rows, dx : dx + w].reshape(rows * w, cin)
            t = jax.lax.dot_general(
                sl, k_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    o_ref[0] = (acc + c_ref[:]).astype(o_ref.dtype).reshape(rows, w, cout)


def conv_halo(x, kernel, bias, pad, interpret=None):
    """General small-kernel conv as one Pallas program with row-halo
    chunking (the conv3x3_halo pattern for arbitrary [kh, kw] kernels
    and asymmetric SAME padding) — used for the composed reconstruction
    conv (ops/fused_upsample.py), whose ~5x5 kernel at B=1 pays the
    same in-model conv-op pathology.

    pad: ((plo_h, phi_h), (plo_w, phi_w)) with plo+phi == k-1 per dim
    (output H, W == input H, W).  Differentiable via jax.vjp of the
    XLA conv (backward runs pre-fusion cost)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kh, kw = int(kernel.shape[0]), int(kernel.shape[1])
    (plo, phi), (plo_w, phi_w) = pad
    assert plo + phi == kh - 1 and plo_w + phi_w == kw - 1, (pad, kh, kw)

    def reference(x, kernel, bias):
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)

    def forward(x, kernel, bias):
        bsz, h, w, cin = x.shape
        cout = kernel.shape[-1]
        if (cin < 8 or w % 8 != 0) and not interpret:
            # same VMEM-unmodelable regimes as conv3x3_halo (tiny-cin
            # lane-pad reshapes / sublane-unaligned widths); interpret
            # mode has no Mosaic so CPU tests still drive the kernel
            return reference(x, kernel, bias)
        xb = x.dtype.itemsize
        cb = 2 if x.dtype == jnp.bfloat16 else 4
        per_row = w * (cin * (6 * xb + 3 * cb) + cout * (4 + 2 * xb))
        rows = _fit_rows(h, per_row, min_rows=max(plo, phi, 2),
                         halo=max(plo + phi, 2), strict=STRICT)
        if rows == 0 or rows < max(plo, phi):
            return reference(x, kernel, bias)  # tiny input or VMEM-bound
        nr = pl.cdiv(h, rows)
        dtype = x.dtype
        cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
        cur = lambda bb, r: (bb, r, 0, 0)
        prv = lambda bb, r: (bb, jnp.maximum(r - 1, 0), 0, 0)
        nxt = lambda bb, r: (bb, jnp.minimum(r + 1, nr - 1), 0, 0)
        xblk = lambda m: pl.BlockSpec((1, rows, w, cin), m,
                                      memory_space=pltpu.VMEM)
        const = lambda *shape: (lambda bb, r: tuple([0] * len(shape)))
        full = lambda a: pl.BlockSpec(a.shape, const(*a.shape),
                                      memory_space=pltpu.VMEM)
        kk = kernel.astype(cdt)
        cc_ = bias.astype(jnp.float32).reshape(1, -1)
        kfn = functools.partial(
            _convk_kernel, rows=rows, h=h, w=w, cin=cin, cout=cout,
            cdt=cdt, kh=kh, kw=kw, plo=plo, phi=phi,
            plo_w=plo_w, phi_w=phi_w,
        )
        return pl.pallas_call(
            kfn,
            grid=(bsz, nr),
            in_specs=[xblk(prv), xblk(cur), xblk(nxt), full(kk), full(cc_)],
            out_specs=pl.BlockSpec((1, rows, w, cout), cur,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dtype),
            interpret=interpret,
        )(x, x, x, kk, cc_)

    @jax.custom_vjp
    def op(x, kernel, bias):
        return forward(x, kernel, bias)

    def fwd(*a):
        return op(*a), a

    def bwd(res, ct):
        _, vjp = jax.vjp(reference, *res)
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(fwd, bwd)
    return op(x, kernel, bias)


def _dwconv_kernel(xp_ref, xc_ref, xn_ref, k_ref, c_ref, o_ref,
                   *, rows, h, w, c):
    r = pl.program_id(1)
    x = jnp.concatenate(
        [xp_ref[0, rows - 1 :], xc_ref[0], xn_ref[0, :1]], axis=0
    ).astype(jnp.float32)
    row0 = r * rows - 1
    rid = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    x = jnp.where(jnp.logical_and(rid >= 0, rid < h), x, 0.0)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    acc = c_ref[0]  # [C] broadcast
    for dy in range(3):
        for dx in range(3):
            acc = acc + xp[dy : dy + rows, dx : dx + w] * k_ref[dy, dx]
    o_ref[0] = acc.astype(o_ref.dtype)


def dwconv3x3_halo(x, kernel, bias, interpret=None):
    """Depthwise SAME 3x3 conv (feature_group_count=C) as one Pallas
    program: 9 shifted VPU multiply-adds on row-halo chunks — no MXU,
    one activation read.  kernel: [3, 3, 1, C] (the flax nn.Conv
    depthwise layout) or [3, 3, C]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kernel.ndim == 4:
        kernel = kernel.reshape(3, 3, -1)

    def reference(x, kernel, bias):
        xp4 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = (xp4[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
                     .astype(jnp.float32) * kernel[dy, dx])
                acc = t if acc is None else acc + t
        return (acc + bias).astype(x.dtype)

    def forward(x, kernel, bias):
        bsz, h, w, c = x.shape
        if w % 8 != 0 and not interpret:
            # sublane-unaligned widths: see conv3x3_halo
            return reference(x, kernel, bias)
        xb = x.dtype.itemsize
        # 3 input chunks double-buffered + fp32 concat/where/pad copies
        # + fp32 acc + out double-buffered
        per_row = w * c * (8 * xb + 16)
        rows = _fit_rows(h, per_row, min_rows=2, strict=STRICT)
        if rows == 0:
            return reference(x, kernel, bias)
        nr = pl.cdiv(h, rows)
        cur = lambda bb, r: (bb, r, 0, 0)
        prv = lambda bb, r: (bb, jnp.maximum(r - 1, 0), 0, 0)
        nxt = lambda bb, r: (bb, jnp.minimum(r + 1, nr - 1), 0, 0)
        xblk = lambda m: pl.BlockSpec((1, rows, w, c), m,
                                      memory_space=pltpu.VMEM)
        const = lambda *shape: (lambda bb, r: tuple([0] * len(shape)))
        full = lambda a: pl.BlockSpec(a.shape, const(*a.shape),
                                      memory_space=pltpu.VMEM)
        kk = kernel.astype(jnp.float32)
        cc_ = bias.astype(jnp.float32).reshape(1, -1)
        kfn = functools.partial(
            _dwconv_kernel, rows=rows, h=h, w=w, c=c,
        )
        return pl.pallas_call(
            kfn,
            grid=(bsz, nr),
            in_specs=[xblk(prv), xblk(cur), xblk(nxt), full(kk), full(cc_)],
            out_specs=pl.BlockSpec((1, rows, w, c), cur,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
            interpret=interpret,
        )(x, x, x, kk, cc_)

    @jax.custom_vjp
    def op(x, kernel, bias):
        return forward(x, kernel, bias)

    def fwd(*a):
        return op(*a), a

    def bwd(res, ct):
        _, vjp = jax.vjp(reference, *res)
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(fwd, bwd)
    return op(x, kernel, bias)


def fused_ln_cab_convs(x, g, b, k1, c1, k2, c2, interpret=None):
    """conv3x3(gelu_exact(conv3x3(LN(x)))) fused, NHWC.

    x: [B, H, W, Cin]; g/b: LN scale/bias [Cin]; k1 [3,3,Cin,Cmid],
    k2 [3,3,Cmid,Cout] with biases c1/c2 (the flax ``nn.Conv`` layout,
    so CAB checkpoints are interchangeable).  Output feeds the SE gate.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def op(x, g, b, k1, c1, k2, c2):
        return _forward(x, g, b, k1, c1, k2, c2, interpret)

    def fwd(*a):
        return op(*a), a

    def bwd(res, ct):
        _, vjp = jax.vjp(_reference, *res)
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(fwd, bwd)
    return op(x, g, b, k1, c1, k2, c2)

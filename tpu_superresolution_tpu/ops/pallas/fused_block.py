"""Full-SwinBlock Pallas megakernel: LayerNorm -> qkv -> windowed
bias/mask attention -> proj -> residual -> LayerNorm -> MLP -> residual,
all in ONE VMEM program per image strip.

Beyond ops/pallas/fused_attention.py (which fuses qkv+attn+proj but
still pays XLA window_partition / window_reverse layout passes plus
separate LN/MLP kernels around every pallas_call), this kernel:

- consumes the feature map [B, H, W, C] DIRECTLY.  Each grid step loads
  one strip of P windows — block (1, ws, P*ws, C), whose natural
  row-major flattening [ws*P*ws, C] is a free reshape.  Window
  partition/reverse disappear: attention is permutation-equivariant, so
  instead of reordering tokens we reorder the BIAS/MASK tables at trace
  time (strip token s sits in window (s % (P*ws)) // ws at intra-window
  position (s // (P*ws)) * ws + s % ws; numpy does the bookkeeping).
- runs both LayerNorms (fp32 stats, flax formula), the erf/tanh-gelu
  MLP, and both residual adds in VMEM.  Per block layer the only HBM
  traffic is x in + out out + resident weights.
- reproduces the reference SwinTransformerBlock semantics
  (modules/network_swinir.py:239-279) including the shifted-window mask
  (:259-262); the cyclic roll itself commutes with every pointwise op,
  so callers roll OUTSIDE (jnp.roll is a cheap XLA copy) and this
  kernel sees the rolled domain.

Shift-mask tiles are deduplicated: a (rows x chunks) image has at most
4 distinct strip-mask patterns (interior / last-row / last-col /
corner), found with np.unique; the per-strip tile index rides in as a
scalar-prefetch argument so the index_map can look it up.

Backward = custom_vjp over the jnp reference composition (exact math,
recompute).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_superresolution_tpu.ops.pallas.fused_attention import _prep_weights

_NEG = -1e9


def _ln(x32, scale, bias, eps=1e-5):
    """flax nn.LayerNorm (fast-variance) in fp32."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _gelu(x, approximate):
    return jax.nn.gelu(x, approximate=approximate)


def _kernel(idx_ref,  # scalar-prefetch: [n_strips] mask-tile index
            x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            g1_ref, b1_ref, g2_ref, b2_ref,
            wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
            rpb_ref, mask_ref, o_ref,
            *, num_heads, hdp, t, c, cdt, gelu_approx):
    xf = x_ref[:].reshape(t, c).astype(jnp.float32)

    # ---- LN1 -> qkv -> windowed attention -> proj ----
    y = _ln(xf, g1_ref[:], b1_ref[:]).astype(cdt)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[:]).astype(cdt)

    koff = num_heads * hdp
    voff = 2 * koff
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * hdp : (h + 1) * hdp]
        k = qkv[:, koff + h * hdp : koff + (h + 1) * hdp]
        v = qkv[:, voff + h * hdp : voff + (h + 1) * hdp]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + rpb_ref[h] + mask_ref[0]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        sm = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        o = jax.lax.dot_general(
            sm, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        outs.append(o.astype(cdt))
    o_cat = jnp.concatenate(outs, axis=-1)
    attn = jax.lax.dot_general(
        o_cat, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:]

    x1 = xf + attn

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

    out = x1 + mlp
    o_ref[:] = out.astype(o_ref.dtype).reshape(x_ref.shape)


def _strip_layout(ws: int, p: int):
    """Token bookkeeping for a [ws, p*ws] strip flattened row-major."""
    t = ws * p * ws
    s = np.arange(t)
    hh = s // (p * ws)
    wwi = s % (p * ws)
    jwin = wwi // ws              # which of the P windows
    q = hh * ws + (wwi % ws)      # intra-window token index
    same = jwin[:, None] == jwin[None, :]
    return t, jwin, q, same


def _strip_mask_tiles(mask: Optional[np.ndarray], nwh: int, nww: int,
                      ws: int, p: int):
    """Dedup'd strip mask tiles [K, T, T] + per-strip index [nwh*nchunks].
    Tiles carry the -1e9 cross-window term; masked entries add the
    shift-mask values permuted into strip order."""
    t, jwin, q, same = _strip_layout(ws, p)
    nchunks = nww // p
    base = np.where(same, 0.0, _NEG).astype(np.float32)
    if mask is None:
        return base[None], np.zeros((nwh * nchunks,), np.int32)

    # mask: [nW, N, N] in window-row-major order
    tiles = np.empty((nwh * nchunks, t, t), np.float32)
    qq = q[:, None] * mask.shape[1] + q[None, :]  # flat [T,T] index into N*N
    mflat = mask.reshape(mask.shape[0], -1)
    for r in range(nwh):
        for cch in range(nchunks):
            widx = r * nww + cch * p + jwin  # [T] window id per token row
            # entry (s1, s2) uses window widx[s1] (rows' window)
            tile = mflat[widx[:, None], qq] * same + base
            tiles[r * nchunks + cch] = tile
    uniq, inverse = np.unique(
        tiles.reshape(tiles.shape[0], -1), axis=0, return_inverse=True
    )
    return uniq.reshape(-1, t, t), inverse.astype(np.int32)


def _reference_block(x, g1, b1, wqkv, bqkv, wproj, bproj,
                     g2, b2, wfc1, bfc1, wfc2, bfc2, bias,
                     ws, mask, scale, gelu_approx):
    """jnp composition with identical semantics (vjp + oracle).
    x: [B, H, W, C] (already rolled)."""
    from tpu_superresolution_tpu.ops.window import (
        window_partition,
        window_reverse,
    )
    from tpu_superresolution_tpu.ops.pallas.fused_attention import (
        _reference_impl,
    )

    b, hh, www, c = x.shape
    xf = x.astype(jnp.float32)
    y = _ln(xf, g1, b1).astype(x.dtype)
    xw = window_partition(y, ws)  # [B*nW, N, C]
    attn = _reference_impl(xw, wqkv, bqkv, wproj, bproj, bias, mask, scale)
    attn = window_reverse(attn, ws, hh, www).astype(jnp.float32)
    x1 = xf + attn
    y2 = _ln(x1, g2, b2).astype(x.dtype)
    h1 = y2 @ wfc1.astype(x.dtype)
    h1 = h1 + bfc1.astype(x.dtype)
    h1 = _gelu(h1.astype(jnp.float32), gelu_approx).astype(x.dtype)
    mlp = h1 @ wfc2.astype(x.dtype) + bfc2.astype(x.dtype)
    out = x1 + mlp.astype(jnp.float32)
    return out.astype(x.dtype)


def _mega_forward(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                  wfc1, bfc1, wfc2, bfc2, bias,
                  ws, mask, scale, gelu_approx, interpret, max_p=4):
    b, hh, www, c = x.shape
    nh = bias.shape[0]
    nwh, nww = hh // ws, www // ws
    p = 1
    for cand in (max_p, 2, 1):
        if cand <= max_p and nww % cand == 0 and ws * cand * ws <= 512:
            p = cand
            break
    nchunks = nww // p
    t, jwin, q, same = _strip_layout(ws, p)

    w, bq, wp, bp, hdp = _prep_weights(wqkv, bqkv, wproj, bproj, nh, scale)

    # permuted per-head RPB: [nH, T, T]
    bias32 = bias.astype(jnp.float32)
    rpb = bias32[:, q[:, None], q[None, :]] * jnp.asarray(
        same, jnp.float32
    )[None]

    tiles, inverse = _strip_mask_tiles(mask, nwh, nww, ws, p)
    # strip id = (b, r, cch) -> r * nchunks + cch (batch-independent)
    strip_idx = jnp.asarray(np.tile(inverse, b), jnp.int32)

    dtype = x.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    row = lambda a: a.reshape(1, -1)

    kernel = functools.partial(
        _kernel, num_heads=nh, hdp=hdp, t=t, c=c, cdt=cdt,
        gelu_approx=gelu_approx,
    )

    grid = (b, nwh, nchunks)

    def xmap(bb, r, cc, idx_ref):
        return (bb, r, cc, 0)

    def maskmap(bb, r, cc, idx_ref):
        return (idx_ref[(bb * nwh + r) * nchunks + cc], 0, 0)

    const = lambda *shape: (lambda bb, r, cc, idx_ref: tuple([0] * len(shape)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, p * ws, c), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w.shape[1]), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq.shape[1]), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp.shape[0], c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wfc1.shape, const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wfc1.shape[1]), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wfc2.shape, const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, t, t), const(0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), maskmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, p * ws, c), xmap, memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(
        strip_idx,
        x,
        w.astype(cdt), row(bq),
        wp.astype(cdt), row(bp),
        row(g1.astype(jnp.float32)), row(b1.astype(jnp.float32)),
        row(g2.astype(jnp.float32)), row(b2.astype(jnp.float32)),
        wfc1.astype(cdt), row(bfc1.astype(jnp.float32)),
        wfc2.astype(cdt), row(bfc2.astype(jnp.float32)),
        rpb, jnp.asarray(tiles),
    )
    return out


def fused_swin_block(
    x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
    wfc1, bfc1, wfc2, bfc2, bias,
    ws, mask=None, scale=1.0, gelu_approx=True, interpret=None,
):
    """Full Swin transformer block on a (pre-rolled) [B, H, W, C] map.

    Requires H % ws == 0 and W % ws == 0 (callers reflect-pad — the
    model already guarantees window multiples).  Differentiable via
    custom_vjp over the jnp reference composition.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
           wfc1, bfc1, wfc2, bfc2, bias):
        return _mega_forward(
            x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
            wfc1, bfc1, wfc2, bfc2, bias,
            ws, mask, scale, gelu_approx, interpret,
        )

    def op_fwd(*args):
        return op(*args), args

    def op_bwd(res, ct):
        _, vjp = jax.vjp(
            lambda *a: _reference_block(*a, ws, mask, scale, gelu_approx),
            *res,
        )
        return vjp(ct.astype(res[0].dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
              wfc1, bfc1, wfc2, bfc2, bias)

"""DAT — Dual Aggregation Transformer, TPU-native (NHWC Flax).

Capability parity with the reference ``modules/dat_arch.py:699-859``:

- Alternating blocks (dat_arch.py:538-549): even b_idx -> adaptive
  SPATIAL attention (dual rectangular-window branches on half channels,
  H-rect idx0 = (s0, s1) windows, W-rect idx1 = (s1, s0) — :159-167),
  odd b_idx -> adaptive CHANNEL attention (XCiT CxC attention over
  L2-normalized q, k with learned per-head temperature — :497-501).
- Shift parity rule (:290,389): shifts of (s0//2, s1//2) applied when
  (rg even and b_idx in {2, 6, ...}) or (rg odd and b_idx in {0, 4, ...});
  branch 0 rolls (-sh0, -sh1), branch 1 rolls (-sh1, -sh0).
- Dynamic position bias (:93-130): CrossFormer-style MLP over the
  (dh, dw) mother set generates the rect-window bias table per forward.
- AIM cross-gating with OPPOSITE directions in the two block types
  (:420-431 vs :510-521): spatial blocks gate attention by the conv
  branch's channel map and conv by the attention's spatial map; channel
  blocks swap the roles.
- SGFN (:57-90): split-channel FFN, one half depthwise-conv gated.
- Per-attention padding to split-size multiples + crop (:376-385) —
  NO model-level check_image_size (matches the reference).

All masks / rpe index sets are trace-time numpy constants.  Module
names mirror torch keys for interop/torch_convert.convert_dat.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import DATConfig, register_model
from tpu_superresolution_tpu.models.blocks import (
    Conv3x3,
    DenseParams,
    DWConv3x3,
    LayerNormParams,
    PixelShuffleDirect,
    PixelShuffleUpsample,
    PLayerNorm,
    drop_path,
    upsample_and_last,
)
from tpu_superresolution_tpu.ops.window import (
    rect_shift_attn_mask,
    rect_shift_region_ids,
    rect_window_partition,
    rect_window_reverse,
    relative_position_index,
)

Dtype = Any
_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
_LN_EPS = 1e-5

# LayerNorm impl for every DAT LN site.  "xla" is the round-2 measured
# configuration (136.4 ms whole-forward at 256^2); the blanket Pallas-LN
# swap that helped HAT re-measured DAT at 206.8 ms (PARITY.md round-3
# session 2) — DAT's blocks are pure-XLA jnp einsums and the separate
# Pallas calls break XLA's elementwise fusion around them.  The queued
# experiments/dat_impl_matrix.py A/B flips this global to re-test
# "pallas" on chip; flip the default only with a measured win.
LN_IMPL = "xla"

# Spatial-attention softmax accumulation dtype.  True (default) casts
# the [B,nW,nh,N,N] score maps to fp32 for the softmax — the dominant
# HBM term at production shapes (~805 MB of fp32 maps per block,
# PARITY.md round-3 DAT floor analysis).  False keeps the softmax in
# the compute dtype (bf16), halving that traffic; the reference itself
# softmaxes in the attn dtype (dat_arch.py:235), so bf16 is the closer
# semantic under AMP.  A/B: experiments/dat_bf16_maps_ab.py.  fp32
# models (parity tests) are unaffected either way.
SOFTMAX_FP32 = True

# XCiT channel-attention formulation.  "heads": the reference-shaped
# per-head einsums over [B, nh, hd, N] channel-major tensors
# (dat_arch.py:441-509) — XLA materializes the channel-major relayouts
# of q/k/v in HBM at production shapes.  "blockdiag": mathematically
# identical full-[C, C] formulation — the L2 normalization factorizes
# out of the token contraction (gram = q^T k, per-channel norms), the
# per-head softmax becomes ONE [C, C] softmax with an off-block-
# diagonal -inf mask, and out = v @ A^T — every op is a plain [T, C]
# or [C, C] GEMM/reduction, no relayouts, nothing for Mosaic to
# reject.  Flip default on a measured >=2% interleaved win
# (experiments/dat_chan_blockdiag_ab.py).  "auto" resolves to
# "blockdiag" on TPU (measured -6.2% whole-model at 256^2, -5.3% at
# 192^2) and "heads" elsewhere, mirroring attention_impl="auto";
# numerics differ only by bf16 reduction order (dB-transparent, see
# experiments/dat_fused_eval_check.py).
CHAN_ATTN_IMPL = "heads"


def resolved_chan_attn_impl() -> str:
    if CHAN_ATTN_IMPL == "auto":
        import jax

        return "blockdiag" if jax.default_backend() == "tpu" else "heads"
    return CHAN_ATTN_IMPL


def force_exact_chain() -> None:
    """Pin every DAT inference-path implementation switch to the
    reference module chain (used by evaluate --exact: the fused
    kernels and the blockdiag channel attention are dB-transparent
    but not bitwise, like fused_reconstruct)."""
    global CHAN_ATTN_IMPL
    CHAN_ATTN_IMPL = "heads"
    from tpu_superresolution_tpu.ops.pallas import fused_channel_attn as _fc
    from tpu_superresolution_tpu.ops.pallas import fused_datb_tail as _ft
    from tpu_superresolution_tpu.ops.pallas import fused_rect_attn as _fr

    _ft.FUSED_TAIL = "off"
    _fr.FUSED_RECT = "off"
    _fr.FUSED_RECT_SHIFTED = "off"
    _fc.FUSED_CHAN = "off"


def _pln(dtype, name):
    """DAT-local PLayerNorm bound to the module-global LN_IMPL."""
    return PLayerNorm(dtype=dtype, impl=LN_IMPL, name=name)


def _rpe_biases(hsp: int, wsp: int) -> np.ndarray:
    """Mother set of (dh, dw) offsets, [(2hsp-1)*(2wsp-1), 2] float32
    (dat_arch.py:172-176)."""
    bh = np.arange(1 - hsp, hsp)
    bw = np.arange(1 - wsp, wsp)
    b = np.stack(np.meshgrid(bh, bw, indexing="ij"))  # [2, 2h-1, 2w-1]
    return b.reshape(2, -1).T.astype(np.float32)


class DynamicPosBias(nn.Module):
    """CrossFormer dynamic relative position bias MLP (dat_arch.py:93-130,
    residual=False path)."""

    pos_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, biases):
        x = nn.Dense(self.pos_dim, kernel_init=_TRUNC02, dtype=self.dtype,
                     name="pos_proj")(biases)
        for i, feat in ((1, self.pos_dim), (2, self.pos_dim), (3, self.num_heads)):
            # These norms run on the tiny [(2h-1)(2w-1), pos_dim]
            # coordinate tensor ~180x per forward; layernorm_spatial's
            # sub-4k-row gate keeps them on the fusable jnp formula
            # (a Pallas launch each would be pure dispatch overhead).
            x = _pln(self.dtype, name=f"pos{i}_norm")(x)
            x = nn.relu(x)
            x = nn.Dense(feat, kernel_init=_TRUNC02, dtype=self.dtype,
                         name=f"pos{i}_fc")(x)
        return x


class SpatialAttentionBranch(nn.Module):
    """One rectangular-window attention branch (dat_arch.py:133-244).
    Operates on [B, H, W, Cb] half-channel features; qkv comes in
    pre-projected."""

    hsp: int
    wsp: int
    num_heads: int
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            batched_window_attention,
            resolve_attention_impl,
        )

        b, h, w, c = q.shape
        hsp, wsp, nh = self.hsp, self.wsp, self.num_heads
        hd = c // nh
        n = hsp * wsp
        nw = (h // hsp) * (w // wsp)

        pos = DynamicPosBias(c // 4 // 4, nh, self.dtype, name="pos")(
            jnp.asarray(_rpe_biases(hsp, wsp))
        )  # [(2h-1)(2w-1), nh]
        rpi = relative_position_index(hsp, wsp)
        bias = pos[rpi.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)

        if resolve_attention_impl(self.attn_impl) == "pallas":
            # Measured (v5e, 256x256 DAT production config): the jnp
            # einsum path wins here — 136.4 ms whole-model vs 175.4
            # (packed kernel, (P-1)/P FLOPs dead in -1e9 blocks at
            # N=128) and 168.8 (batched kernel; the [B*nW,n,nh,hd] ->
            # [.,nh,n,hd] relayout XLA must materialize beforehand
            # costs more than the kernel saves — N=128 windows are
            # already lane-perfect for XLA's einsums).  'auto' therefore
            # resolves to jnp for this branch; the batched kernel stays
            # selectable for comparison.
            to_kernel = lambda t: (
                rect_window_partition(t, hsp, wsp)
                .reshape(b * nw, n, nh, hd)
                .transpose(0, 2, 1, 3)
            )
            m = jnp.asarray(mask) if mask is not None else None
            out = batched_window_attention(
                to_kernel(q * (hd**-0.5)).astype(self.dtype),
                to_kernel(k).astype(self.dtype),
                to_kernel(v).astype(self.dtype),
                bias.astype(jnp.float32), m, scale=1.0,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b * nw, n, c)
            return rect_window_reverse(out, hsp, wsp, h, w)

        def windows(x):
            xw = rect_window_partition(x, hsp, wsp)  # [B*nW, n, C]
            return xw.reshape(b, nw, n, nh, hd)

        qw, kw, vw = windows(q), windows(k), windows(v)
        attn = jnp.einsum("bwqhd,bwkhd->bwhqk", qw * (hd**-0.5), kw)
        attn = attn + bias[None, None].astype(attn.dtype)

        if mask is not None:
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
        # reference softmaxes in the attn dtype (dat_arch.py:235)
        sm_dtype = jnp.float32 if SOFTMAX_FP32 else attn.dtype
        attn = jax.nn.softmax(attn.astype(sm_dtype), axis=-1).astype(q.dtype)
        out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, vw).reshape(b * nw, n, c)
        return rect_window_reverse(out, hsp, wsp, h, w)


class _DWConvBranch(nn.Module):
    """dwconv 3x3 (groups=C) -> BN -> GELU (dat_arch.py:299-303)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = DWConv3x3(c, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.gelu(x, approximate=False)


class _ChannelInteraction(nn.Module):
    """GAP -> 1x1 C/8 -> BN -> GELU -> 1x1 C (dat_arch.py:304-310)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.out_dim // 8, (1, 1), dtype=self.dtype, name="fc1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="fc2")(y)


class _SpatialInteraction(nn.Module):
    """1x1 C/16 -> BN -> GELU -> 1x1 1 (dat_arch.py:311-316)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c // 16, (1, 1), dtype=self.dtype, name="fc1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="fc2")(y)


class _Conv1x1Params(nn.Module):
    """nn.Conv(features, (1,1))-compatible raw params (kernel reshaped
    to a dense [Cin, Cout] for in-kernel GEMMs)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, in_features, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k.reshape(in_features, self.features), b


class _BatchNormParams(nn.Module):
    """nn.BatchNorm-compatible raw params + running stats (read-only —
    the fused tail is inference-only, so stats are never updated)."""

    features: int

    @nn.compact
    def __call__(self):
        f = self.features
        s = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        return s, b, mean.value, var.value


class _SpatialInteractionParams(nn.Module):
    """_SpatialInteraction's param tree (fc1/bn/fc2) raw, with the
    inference BatchNorm folded into fc1 for the fused tail kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        from tpu_superresolution_tpu.ops.pallas.fused_datb_tail import (
            fold_bn_into_dense,
        )

        c = self.dim
        w1, b1 = _Conv1x1Params(c // 16, name="fc1")(c)
        bs, bb, bm, bv = _BatchNormParams(c // 16, name="bn")()
        w1, b1 = fold_bn_into_dense(w1, b1, bs, bb, bm, bv)
        w2, b2 = _Conv1x1Params(1, name="fc2")(c // 16)
        return w1, b1, w2, b2


class _DWConvParams(nn.Module):
    """DWConv3x3-compatible raw params ({kernel [3,3,1,C], bias})."""

    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k, b


class _PosOnly(nn.Module):
    """Scope wrapper so the fused-rect path declares the branch's
    DynamicPosBias under the module-path name the module chain uses
    (attn/attns_{idx}/pos)."""

    pos_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, biases):
        return DynamicPosBias(
            self.pos_dim, self.num_heads, self.dtype, name="pos"
        )(biases)


class _DWConvBranchParams(nn.Module):
    """_DWConvBranch's param tree (conv/bn) raw, with the inference
    BatchNorm folded into the depthwise kernel+bias (conv THEN bn:
    y = (conv(v)+b - mean) * scale/sqrt(var+eps) + bias)."""

    features: int

    @nn.compact
    def __call__(self):
        k, b = _DWConvParams(self.features, name="conv")()
        bs, bb, bm, bv = _BatchNormParams(self.features, name="bn")()
        s = bs * jax.lax.rsqrt(bv + 1e-5)
        return k * s, b * s + bb - bm * s


class _SGFNParams(nn.Module):
    """SGFN's param tree (fc1/sg_norm/sg_conv/fc2) raw for the fused
    tail kernel."""

    hidden: int
    out_features: int

    @nn.compact
    def __call__(self, in_features: int):
        half = self.hidden // 2
        w1, b1 = DenseParams(
            self.hidden, kernel_init=_TRUNC02, name="fc1"
        )(in_features)
        gsg, bsg = LayerNormParams(name="sg_norm")(half)
        wdw, bdw = _DWConvParams(half, name="sg_conv")()
        w2, b2 = DenseParams(
            self.out_features, kernel_init=_TRUNC02, name="fc2"
        )(half)
        return w1, b1, gsg, bsg, wdw, bdw, w2, b2


class AdaptiveSpatialAttention(nn.Module):
    """Dual-branch rect-window attention + conv branch + AIM
    (dat_arch.py:247-438).

    ``tail="fused"`` (inference only): stop after the attention/conv
    branches and the (global) channel-interaction gate, declare the
    spatial-interaction and proj params raw, and return the pieces for
    ops/pallas/fused_datb_tail — which runs AIM gating -> proj ->
    residual -> LN2 -> SGFN in one VMEM pass per row strip."""

    dim: int
    num_heads: int
    split_size: Tuple[int, int]
    qkv_bias: bool
    do_shift: bool
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32
    tail: str = "module"

    @nn.compact
    def __call__(self, x, train: bool = False, norm1=None):
        b, h, w, c = x.shape
        s0, s1 = self.split_size
        sh0, sh1 = s0 // 2, s1 // 2

        if norm1 is not None:
            # fused-rect path: `x` is the RAW block input; LN1 + qkv +
            # both rect branches + the conv branch run as one Pallas
            # kernel (ops/pallas/fused_rect_attn.py).  Inference-only
            # (DATB gates on fused_rect_ok); composes with either tail
            # (fused kernel or the regular AIM+proj modules below).
            from tpu_superresolution_tpu.ops.pallas.fused_rect_attn import (
                fused_rect_attention,
            )

            g1n, b1n = norm1
            wqkv, bqkv = DenseParams(
                3 * c, kernel_init=_TRUNC02, use_bias=self.qkv_bias,
                name="qkv",
            )(c)
            nhb = self.num_heads // 2
            biases = []
            for idx, (hsp, wsp) in enumerate(((s0, s1), (s1, s0))):
                # pos_dim matches SpatialAttentionBranch: the branch
                # operates on half channels, pos_dim = (C/2) // 16
                pos = _PosOnly(
                    (c // 2) // 4 // 4, nhb, self.dtype,
                    name=f"attns_{idx}",
                )(jnp.asarray(_rpe_biases(hsp, wsp)))
                rpi = relative_position_index(hsp, wsp)
                nn_ = hsp * wsp
                biases.append(
                    pos[rpi.reshape(-1)]
                    .reshape(nn_, nn_, nhb)
                    .transpose(2, 0, 1)
                )
            wdwf, bdwf = _DWConvBranchParams(c, name="dwconv")()
            xr0 = xr1 = mask0 = mask1 = None
            if self.do_shift:
                xr0 = jnp.roll(x, (-sh0, -sh1), axis=(1, 2))
                xr1 = jnp.roll(x, (-sh1, -sh0), axis=(1, 2))
                mask0 = rect_shift_region_ids(h, w, s0, s1, sh0, sh1)
                mask1 = rect_shift_region_ids(h, w, s1, s0, sh1, sh0)
            o0, o1, conv_x = fused_rect_attention(
                x, xr0, xr1, g1n, b1n, wqkv, bqkv, wdwf, bdwf,
                biases[0], biases[1], mask0, mask1, s0, s1,
                self.num_heads,
            )
            if self.do_shift:
                o0 = jnp.roll(o0, (sh0, sh1), axis=(1, 2))
                o1 = jnp.roll(o1, (sh1, sh0), axis=(1, 2))
            attened_x = jnp.concatenate([o0, o1], axis=-1)
            channel_map = _ChannelInteraction(
                c, self.dtype, name="channel_interaction"
            )(conv_x, train)
            if self.tail == "fused":
                gate_sig = jax.nn.sigmoid(channel_map.reshape(b, c))
                spw = _SpatialInteractionParams(
                    c, name="spatial_interaction"
                )()
                proj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
                return attened_x, conv_x, gate_sig, spw, proj
            # Module tail behind the rect kernel: finish AIM + proj with
            # the regular modules (identical param tree).  This is the
            # production pairing at 256^2-class shapes where the fused
            # tail's SGFN dwconv is Mosaic-rejected but the rect kernel
            # compiles (fused_tail_diag4 / fused_rect_diag2, 2026-08-20).
            spatial_map = _SpatialInteraction(
                self.dtype, name="spatial_interaction"
            )(attened_x, train)
            attened_x = attened_x * jax.nn.sigmoid(channel_map)
            conv_x = conv_x * jax.nn.sigmoid(spatial_map)
            return nn.Dense(c, kernel_init=_TRUNC02, dtype=self.dtype,
                            name="proj")(attened_x + conv_x)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=_TRUNC02,
                       dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # conv branch on un-padded V (dat_arch.py:373,418)
        conv_x = _DWConvBranch(self.dtype, name="dwconv")(v, train)

        # pad to max-split multiple (dat_arch.py:376-385)
        ms = max(s0, s1)
        pad_b = (ms - h % ms) % ms
        pad_r = (ms - w % ms) % ms
        if pad_b or pad_r:
            pads = ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
            q, k, v = (jnp.pad(t, pads) for t in (q, k, v))
        hp, wp = h + pad_b, w + pad_r

        half = c // 2
        outs = []
        for idx in (0, 1):
            hsp, wsp = (s0, s1) if idx == 0 else (s1, s0)
            shifts = (sh0, sh1) if idx == 0 else (sh1, sh0)
            qi = q[..., idx * half : (idx + 1) * half]
            ki = k[..., idx * half : (idx + 1) * half]
            vi = v[..., idx * half : (idx + 1) * half]
            mask = None
            if self.do_shift and (shifts[0] or shifts[1]):
                qi, ki, vi = (
                    jnp.roll(t, (-shifts[0], -shifts[1]), axis=(1, 2))
                    for t in (qi, ki, vi)
                )
                mask = rect_shift_attn_mask(hp, wp, hsp, wsp, shifts[0], shifts[1])
            out = SpatialAttentionBranch(hsp, wsp, self.num_heads // 2,
                                         self.attn_impl, self.dtype,
                                         name=f"attns_{idx}")(
                qi, ki, vi, mask
            )
            if self.do_shift and (shifts[0] or shifts[1]):
                out = jnp.roll(out, (shifts[0], shifts[1]), axis=(1, 2))
            outs.append(out[:, :h, :w, :])
        attened_x = jnp.concatenate(outs, axis=-1)

        # ---- AIM (dat_arch.py:420-431): channel map gates attention,
        # spatial map gates conv ----
        channel_map = _ChannelInteraction(c, self.dtype, name="channel_interaction")(
            conv_x, train
        )
        if self.tail == "fused":
            gate_sig = jax.nn.sigmoid(channel_map.reshape(b, c))
            spw = _SpatialInteractionParams(c, name="spatial_interaction")()
            proj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
            return attened_x, conv_x, gate_sig, spw, proj
        spatial_map = _SpatialInteraction(self.dtype, name="spatial_interaction")(
            attened_x, train
        )
        attened_x = attened_x * jax.nn.sigmoid(channel_map)
        conv_x = conv_x * jax.nn.sigmoid(spatial_map)

        out = attened_x + conv_x
        return nn.Dense(c, kernel_init=_TRUNC02, dtype=self.dtype, name="proj")(out)


class AdaptiveChannelAttention(nn.Module):
    """XCiT transposed attention + conv branch + AIM with swapped gating
    (dat_arch.py:441-528)."""

    dim: int
    num_heads: int
    qkv_bias: bool
    dtype: Dtype = jnp.float32
    tail: str = "module"

    @nn.compact
    def __call__(self, x, train: bool = False, norm1=None):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh

        if norm1 is not None:
            # fused-channel path: `x` is the RAW block input; LN1 + qkv
            # + XCiT channel attention + the conv branch run as one
            # two-phase Pallas kernel (ops/pallas/fused_channel_attn.py).
            # Inference-only (DATB gates on fused_chan_ok); composes
            # with either tail, like the spatial rect path.
            from tpu_superresolution_tpu.ops.pallas.fused_channel_attn import (
                fused_channel_attention,
            )

            g1n, b1n = norm1
            wqkv, bqkv = DenseParams(
                3 * c, kernel_init=_TRUNC02, use_bias=self.qkv_bias,
                name="qkv",
            )(c)
            temperature = self.param(
                "temperature", nn.initializers.ones, (nh, 1, 1)
            )
            wdwf, bdwf = _DWConvBranchParams(c, name="dwconv")()
            attened_x, conv_x = fused_channel_attention(
                x, g1n, b1n, wqkv, bqkv, temperature, wdwf, bdwf, nh
            )
            channel_map = _ChannelInteraction(
                c, self.dtype, name="channel_interaction"
            )(attened_x, train)
            if self.tail == "fused":
                gate_sig = jax.nn.sigmoid(channel_map.reshape(b, c))
                spw = _SpatialInteractionParams(
                    c, name="spatial_interaction"
                )()
                proj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
                return conv_x, attened_x, gate_sig, spw, proj
            spatial_map = _SpatialInteraction(
                self.dtype, name="spatial_interaction"
            )(conv_x, train)
            attened_x = attened_x * jax.nn.sigmoid(spatial_map)
            conv_x = conv_x * jax.nn.sigmoid(channel_map)
            return nn.Dense(c, kernel_init=_TRUNC02, dtype=self.dtype,
                            name="proj")(attened_x + conv_x)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=_TRUNC02,
                       dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        temperature = self.param("temperature", nn.initializers.ones, (nh, 1, 1))

        if resolved_chan_attn_impl() == "blockdiag":
            # Full-[C, C] formulation: normalization factorizes out of
            # the token contraction (see CHAN_ATTN_IMPL).  Channel c
            # belongs to head c // hd, so per-head grams are the
            # hd-blocks of the [C, C] diagonal; the off-block mask
            # makes one softmax equal nh per-head softmaxes.
            qf = q.reshape(b, h * w, c).astype(jnp.float32)
            kf = k.reshape(b, h * w, c).astype(jnp.float32)
            gram = jnp.einsum(
                "btc,btd->bcd", qf, kf, precision="highest"
            )  # [B, C, C]
            qn = jnp.maximum(
                jnp.sqrt(jnp.sum(qf * qf, axis=1)), 1e-12
            )  # [B, C]
            kn = jnp.maximum(jnp.sqrt(jnp.sum(kf * kf, axis=1)), 1e-12)
            tcol = jnp.repeat(
                temperature.astype(jnp.float32).reshape(nh), hd
            )  # [C]
            sc = gram / (qn[:, :, None] * kn[:, None, :]) * tcol[None, :, None]
            cid = np.arange(c) // hd
            same = jnp.asarray(cid[:, None] == cid[None, :])
            sc = jnp.where(same[None], sc, -jnp.inf)
            attn = jax.nn.softmax(sc, axis=-1).astype(x.dtype)  # [B, C, C]
            attened_x = jnp.einsum(
                "btc,bdc->btd", v.reshape(b, h * w, c), attn
            ).reshape(b, h, w, c)
        else:
            def heads_t(t):
                # [B,H,W,C] -> [B, nh, hd, N]: channel-token matrix per head
                return t.reshape(b, h * w, nh, hd).transpose(0, 2, 3, 1)

            qt, kt, vt = heads_t(q), heads_t(k), heads_t(v)
            qt = qt / jnp.maximum(
                jnp.linalg.norm(qt.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            ).astype(qt.dtype)
            kt = kt / jnp.maximum(
                jnp.linalg.norm(kt.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            ).astype(kt.dtype)

            attn = jnp.einsum("bhdn,bhen->bhde", qt, kt) * temperature.astype(qt.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhde,bhen->bhdn", attn, vt)  # [B, nh, hd, N]
            attened_x = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)

        conv_x = _DWConvBranch(self.dtype, name="dwconv")(v, train)

        # ---- AIM swapped (dat_arch.py:510-521): channel map from
        # attention, spatial map from conv; attention gated spatially ----
        channel_map = _ChannelInteraction(c, self.dtype, name="channel_interaction")(
            attened_x, train
        )
        if self.tail == "fused":
            # vector-gated tensor u = conv_x (it also sources the
            # per-pixel spatial map); pixel-gated tensor = attened_x
            gate_sig = jax.nn.sigmoid(channel_map.reshape(b, c))
            spw = _SpatialInteractionParams(c, name="spatial_interaction")()
            proj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
            return conv_x, attened_x, gate_sig, spw, proj
        spatial_map = _SpatialInteraction(self.dtype, name="spatial_interaction")(
            conv_x, train
        )
        attened_x = attened_x * jax.nn.sigmoid(spatial_map)
        conv_x = conv_x * jax.nn.sigmoid(channel_map)

        out = attened_x + conv_x
        return nn.Dense(c, kernel_init=_TRUNC02, dtype=self.dtype, name="proj")(out)


class SGFN(nn.Module):
    """Spatial-gate FFN (dat_arch.py:38-90)."""

    hidden: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=_TRUNC02, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        half = self.hidden // 2
        x1, x2 = x[..., :half], x[..., half:]
        x2 = _pln(self.dtype, name="sg_norm")(x2)
        x2 = DWConv3x3(half, dtype=self.dtype, name="sg_conv")(x2)
        x = x1 * x2
        return nn.Dense(self.out_features, kernel_init=_TRUNC02, dtype=self.dtype,
                        name="fc2")(x)


class DATB(nn.Module):
    """Dual aggregation block (dat_arch.py:531-565)."""

    dim: int
    num_heads: int
    split_size: Tuple[int, int]
    expansion_factor: float
    qkv_bias: bool
    rg_idx: int
    b_idx: int
    drop_path_rate: float = 0.0
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tpu_superresolution_tpu.ops.pallas import fused_datb_tail as _ft

        i, j = self.rg_idx, self.b_idx
        do_shift = (i % 2 == 0 and j > 0 and (j - 2) % 4 == 0) or (
            i % 2 != 0 and j % 4 == 0
        )
        # stochastic depth on both residuals (dat_arch.py:562-563)
        use_dp = train and self.drop_path_rate > 0
        # Fused tail (inference): AIM gating + proj + residual + LN2 +
        # SGFN as one Pallas kernel (ops/pallas/fused_datb_tail.py).
        # Training keeps the module chain (BatchNorm stats + drop_path).
        bsz, h, w, _c = x.shape
        fused = (not train) and _ft.fused_tail_ok(h, w, b=bsz)
        tail = "fused" if fused else "module"
        # fused-rect (kernel 1, spatial blocks only): LN1 moves inside
        # the kernel, so norm1 params are declared raw here and x is
        # passed un-normed; the param tree stays identical.
        from tpu_superresolution_tpu.ops.pallas import fused_rect_attn as _fr
        from tpu_superresolution_tpu.ops.pallas import fused_channel_attn as _fc

        rect = (
            (not train)
            and j % 2 == 0
            and _fr.fused_rect_ok(
                h, w, *self.split_size, shifted=do_shift, b=bsz)
        )
        chan = (not train) and j % 2 == 1 and _fc.fused_chan_ok(h, w)
        if rect:
            g1n, b1n = LayerNormParams(name="norm1")(self.dim)
            y = AdaptiveSpatialAttention(
                self.dim, self.num_heads, self.split_size, self.qkv_bias,
                do_shift, self.attn_impl, self.dtype, tail=tail,
                name="attn",
            )(x, train, norm1=(g1n, b1n))
        elif chan:
            g1n, b1n = LayerNormParams(name="norm1")(self.dim)
            y = AdaptiveChannelAttention(
                self.dim, self.num_heads, self.qkv_bias, self.dtype,
                tail=tail, name="attn",
            )(x, train, norm1=(g1n, b1n))
        else:
            y = _pln(self.dtype, name="norm1")(x)
            if j % 2 == 0:
                y = AdaptiveSpatialAttention(
                    self.dim, self.num_heads, self.split_size,
                    self.qkv_bias, do_shift, self.attn_impl, self.dtype,
                    tail=tail, name="attn",
                )(y, train)
            else:
                y = AdaptiveChannelAttention(
                    self.dim, self.num_heads, self.qkv_bias, self.dtype,
                    tail=tail, name="attn",
                )(y, train)
        if fused:
            u, w_px, gate_sig, spw, (wproj, bproj) = y
            g2, b2 = LayerNormParams(name="norm2")(self.dim)
            wfc1, bfc1, gsg, bsg, wdw, bdw, wfc2, bfc2 = _SGFNParams(
                int(self.dim * self.expansion_factor), self.dim, name="ffn"
            )(self.dim)
            return _ft.fused_datb_tail(
                x, u, w_px, gate_sig, *spw, wproj, bproj, g2, b2,
                wfc1, bfc1, gsg, bsg, wdw, bdw, wfc2, bfc2,
            )
        rng = self.make_rng("drop_path") if use_dp else None
        x = x + drop_path(y, self.drop_path_rate, rng is None, rng)
        y = _pln(self.dtype, name="norm2")(x)
        y = SGFN(int(self.dim * self.expansion_factor), self.dim, self.dtype,
                 name="ffn")(y)
        rng2 = self.make_rng("drop_path") if use_dp else None
        return x + drop_path(y, self.drop_path_rate, rng2 is None, rng2)


class ResidualGroup(nn.Module):
    """depth x DATB -> conv3x3 -> + input (dat_arch.py:568-652)."""

    dim: int
    depth: int
    num_heads: int
    split_size: Tuple[int, int]
    expansion_factor: float
    qkv_bias: bool
    rg_idx: int
    drop_path_rates: Tuple[float, ...] = ()
    resi_connection: str = "1conv"
    use_remat: bool = False
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        blk_cls = nn.remat(DATB, static_argnums=(2,)) if self.use_remat else DATB
        for j in range(self.depth):
            x = blk_cls(
                self.dim, self.num_heads, self.split_size,
                self.expansion_factor, self.qkv_bias, self.rg_idx, j,
                self.drop_path_rates[j] if self.drop_path_rates else 0.0,
                self.attn_impl, self.dtype, name=f"blocks_{j}",
            )(x, train)
        if self.resi_connection == "1conv":
            x = Conv3x3(self.dim, dtype=self.dtype, name="conv")(x)
        else:
            x = Conv3x3(self.dim // 4, dtype=self.dtype, name="conv_0")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(self.dim // 4, (1, 1), dtype=self.dtype, name="conv_2")(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv3x3(self.dim, dtype=self.dtype, name="conv_4")(x)
        return x + res


class DAT(nn.Module):
    config: DATConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = self.dtype
        x = x.astype(dt)

        if cfg.in_channels == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], dtype=dt)
        else:
            mean = jnp.zeros((cfg.in_channels,), dtype=dt)
        x = (x - mean) * cfg.img_range

        from tpu_superresolution_tpu.models import blocks as _blocks

        x = Conv3x3(cfg.embed_dim, dtype=dt,
                    impl=_blocks.CONV3X3_INPUT_IMPL, name="conv_first")(x)

        # before_RG: LayerNorm on channels (dat_arch.py:765-768)
        feats = _pln(dt, name="before_RG_norm")(x)
        # stochastic depth decay rule (dat_arch.py:771)
        dpr = [float(r) for r in np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))]
        start = 0
        for i, depth in enumerate(cfg.depths):
            feats = ResidualGroup(
                cfg.embed_dim, depth, cfg.num_heads[i], cfg.split_size,
                cfg.expansion_factor, cfg.qkv_bias, i,
                tuple(dpr[start : start + depth]),
                cfg.resi_connection, cfg.use_remat, cfg.attention_impl, dt,
                name=f"layers_{i}",
            )(feats, train)
            start += depth
        feats = _pln(dt, name="norm")(feats)
        if cfg.resi_connection == "1conv":
            feats = Conv3x3(cfg.embed_dim, dtype=dt, name="conv_after_body")(feats)
        else:
            feats = Conv3x3(cfg.embed_dim // 4, dtype=dt, name="conv_after_body_0")(feats)
            feats = nn.leaky_relu(feats, 0.2)
            feats = nn.Conv(cfg.embed_dim // 4, (1, 1), dtype=dt, name="conv_after_body_2")(feats)
            feats = nn.leaky_relu(feats, 0.2)
            feats = Conv3x3(cfg.embed_dim, dtype=dt, name="conv_after_body_4")(feats)
        x = feats + x

        if cfg.upsampler == "pixelshuffle":
            x = Conv3x3(cfg.num_feat, dtype=dt, name="conv_before_upsample")(x)
            x = nn.leaky_relu(x, 0.01)
            x = upsample_and_last(
                self, x, cfg.scale, cfg.num_feat, cfg.out_channels, dt,
                fused=cfg.fused_reconstruct,
            )
        elif cfg.upsampler == "pixelshuffledirect":
            x = PixelShuffleDirect(cfg.scale, cfg.out_channels, dt, name="upsample")(x)
        else:
            raise ValueError(f"DAT upsampler '{cfg.upsampler}' not supported")

        return x / cfg.img_range + mean


def build_dat(config: DATConfig, dtype=jnp.float32) -> DAT:
    return DAT(config=config, dtype=dtype)


register_model("dat", DATConfig, build_dat)

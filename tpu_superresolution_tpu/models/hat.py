"""HAT — Hybrid Attention Transformer, TPU-native (NHWC Flax).

Capability parity with the reference ``modules/hat_arch.py:710-994``:

- HAB (hat_arch.py:200-310): Swin block with a PARALLEL conv branch —
  ``x = shortcut + attn_x + conv_scale * CAB(x)`` where CAB is
  conv(C->C/3) -> GELU -> conv -> RCAN channel attention (:41-75).
- OCAB (hat_arch.py:353-439): overlapping cross-attention — q from
  non-overlapping ws windows, k/v from enclosing ows windows extracted
  with stride ws and zero padding (the reference's nn.Unfold :378).
  Here the overlapping extraction is a static numpy-index gather on a
  zero-padded tensor (trace-time constants; no unfold op needed).
  NOTE: torch Unfold requires (ows - ws) even to tile correctly (true
  for real HAT configs, e.g. ws=16 overlap 0.5); odd differences get an
  asymmetric pad here so the window grid always matches q.
- rpi_sa / rpi_oca tables and shifted masks are trace-time constants
  (the reference recomputes attn_mask EVERY forward — hat_arch.py:955).
- Only the 'pixelshuffle' reconstruction exists upstream (:864-869) and
  here.

Layout [B, H, W, C] end-to-end; module names mirror torch checkpoint
keys for interop/torch_convert.convert_hat.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import (
    HATConfig,
    HATFastConfig,
    register_model,
)
from tpu_superresolution_tpu.models.blocks import (
    AttnParams,
    Conv3x3,
    LayerNormParams,
    Mlp,
    MlpParams,
    PLayerNorm,
    PixelShuffleUpsample,
    check_image_size,
    upsample_and_last,
    drop_path,
)
from tpu_superresolution_tpu.ops.window import (
    cyclic_shift,
    cyclic_unshift,
    relative_position_index,
    relative_position_index_oca,
    shift_attn_mask,
    window_partition,
    window_reverse,
)

Dtype = Any
_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
_LN_EPS = 1e-5

# CAB 3x3-conv implementation when the module field is None: "gemm"
# (9-shifted GEMMs — restored HAT 93.0 -> 87.0 ms, PARITY round 3),
# "xla" (the conv op), or "halo" (one-read Pallas kernel; needs
# cab_conv.STRICT relaxed at 256^2 — A/B experiments/hat_cab_halo_ab).
CAB_CONV_IMPL = "gemm"


class ChannelAttention(nn.Module):
    """RCAN SE gate (hat_arch.py:41-59): GAP -> 1x1 squeeze -> ReLU ->
    1x1 excite -> sigmoid, multiplied into the features."""

    squeeze_factor: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(c // self.squeeze_factor, (1, 1), dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """Conv attention branch (hat_arch.py:62-75).

    conv_impl "gemm" runs the two 3x3 convs as nine shifted GEMMs
    (blocks.Conv3x3 / ops/conv_gemm.py): the XLA conv op at these
    shapes interleaved with the Pallas megakernels costs ~1.35 ms per
    conv in-model vs ~0.04 standalone (PARITY.md round 3); the GEMM
    form restores the whole-model HAT forward from 93.0 to 87.0 ms.
    "xla" keeps the conv op for A/B.  Both impls share one param tree."""

    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Dtype = jnp.float32
    conv_impl: Optional[str] = None  # None -> module global CAB_CONV_IMPL

    @nn.compact
    def __call__(self, x, ln_scale=None, ln_bias=None):
        """When (ln_scale, ln_bias) are given, x is the PRE-norm input
        and CAB applies HAB's norm1 itself — with cab_conv.ENABLE the
        whole LN -> conv -> gelu -> conv chain runs as one Pallas
        program (the SE gate stays in XLA: global mean, measured
        free)."""
        from tpu_superresolution_tpu.models.blocks import Conv3x3Params
        from tpu_superresolution_tpu.ops.pallas import cab_conv

        c = x.shape[-1]
        cm = c // self.compress_ratio
        if ln_scale is not None and cab_conv.ENABLE:
            k1, c1 = Conv3x3Params(cm, name="conv1")(c)
            k2, c2 = Conv3x3Params(c, name="conv2")(cm)
            y = cab_conv.fused_ln_cab_convs(
                x.astype(self.dtype), ln_scale, ln_bias, k1, c1, k2, c2
            )
        else:
            if ln_scale is not None:
                from tpu_superresolution_tpu.ops.pallas.layernorm import (
                    layernorm_spatial,
                )

                x = layernorm_spatial(
                    x.astype(self.dtype), ln_scale, ln_bias
                )
            impl = CAB_CONV_IMPL if self.conv_impl is None else self.conv_impl
            y = Conv3x3(cm, dtype=self.dtype, impl=impl,
                        name="conv1")(x)
            y = nn.gelu(y, approximate=False)
            y = Conv3x3(c, dtype=self.dtype, impl=impl,
                        name="conv2")(y)
        return ChannelAttention(self.squeeze_factor, self.dtype, name="ca")(y)


class WindowAttentionHAT(nn.Module):
    """Same W-MSA math as SwinIR's (hat_arch.py:130-197); the rpi is a
    trace-time constant rather than a forward argument."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None):
        from tpu_superresolution_tpu.models.blocks import DenseParams
        from tpu_superresolution_tpu.ops.pallas.fused_attention import (
            fused_window_block_attention,
        )
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            fused_window_attention,
            resolve_attention_impl,
        )

        b, nw, n, c = x.shape
        ws, nh = self.window_size, self.num_heads
        hd = c // nh
        dt = self.dtype
        wqkv, bqkv = DenseParams(
            3 * c, kernel_init=_TRUNC02, use_bias=self.qkv_bias, name="qkv"
        )(c)
        wproj, bproj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
        table = self.param("relative_position_bias_table", _TRUNC02,
                           ((2 * ws - 1) ** 2, nh))
        rpi = relative_position_index(ws)
        bias = table[rpi.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)

        impl = resolve_attention_impl(self.attn_impl)
        if impl == "fused":
            # qkv + attention + proj fused (legal for any ws: the packed
            # kernel's blocks span full last-two dims — HAB's megakernel
            # gate falls back here when ws=7 can't tile).  Window count
            # padded to a multiple of 8 so packing survives prime nW
            # (37^2=1369 at 259x259); see WindowAttention in swinir.py.
            nw_pad = (-nw) % 8
            xk, mk = x, mask
            if nw_pad:
                xk = jnp.pad(x, ((0, 0), (0, nw_pad), (0, 0), (0, 0)))
                if mask is not None:
                    mk = np.pad(np.asarray(mask, np.float32),
                                ((0, nw_pad), (0, 0), (0, 0)))
            out = fused_window_block_attention(
                xk.astype(dt).reshape(b * (nw + nw_pad), n, c),
                wqkv, bqkv, wproj, bproj,
                bias.astype(jnp.float32), mk, hd**-0.5,
            ).reshape(b, nw + nw_pad, n, c)
            return out[:, :nw] if nw_pad else out

        qkv = x.astype(dt) @ wqkv.astype(dt)
        if bqkv is not None:
            qkv = qkv + bqkv.astype(dt)
        qkv = qkv.reshape(b, nw, n, 3, nh, hd)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if impl == "pallas":
            to_kernel = lambda t: t.reshape(b * nw, n, nh, hd).transpose(0, 2, 1, 3)
            m = jnp.asarray(mask) if mask is not None else None
            out = fused_window_attention(
                to_kernel(q), to_kernel(k), to_kernel(v),
                bias.astype(jnp.float32), m, scale=hd**-0.5,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, nw, n, c)
        else:
            attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q * (hd**-0.5), k)
            attn = attn + bias[None, None].astype(attn.dtype)
            if mask is not None:
                attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, v).reshape(b, nw, n, c)
        out = out.astype(dt) @ wproj.astype(dt)
        return out + bproj.astype(dt)


class HAB(nn.Module):
    """Hybrid attention block (hat_arch.py:200-310)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    mlp_ratio: float
    qkv_bias: bool
    drop_path_rate: float = 0.0
    attn_impl: str = "auto"
    gelu_approximate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from tpu_superresolution_tpu.ops.pallas.fused_block import (
            _ln,
            fused_packed_windows_block,
            fused_swin_block,
        )
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            resolve_attention_impl,
        )

        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0

        # Fused path: the whole HAB (LN1 -> W-MSA -> +CAB -> residual ->
        # LN2 -> MLP -> residual, hat_arch.py:287-310) runs as one Pallas
        # megakernel; the CAB conv branch is computed outside (XLA convs)
        # and rides into the kernel as the `extra` additive term.
        # Drop-path applies to the attention residual (NOT the CAB
        # branch, hat_arch.py:307-308) and the MLP residual; both ride
        # into the kernel as per-sample branch_scales.
        from tpu_superresolution_tpu.ops.pallas.fused_block import (
            megakernel_tpu_ok,
        )

        dp_active = (not deterministic) and self.drop_path_rate > 0
        if (
            resolve_attention_impl(self.attn_impl) == "fused"
            and h % ws == 0
            and w % ws == 0
        ):
            nh = self.num_heads
            wqkv, bqkv, wproj, bproj, table = AttnParams(
                self.dim, ws, nh, self.qkv_bias, name="attn"
            )()
            g1, b1 = LayerNormParams(name="norm1")(c)
            g2, b2 = LayerNormParams(name="norm2")(c)
            w1, bb1, w2, bb2 = MlpParams(
                int(self.dim * self.mlp_ratio), self.dim, name="mlp"
            )(c)
            rpi = relative_position_index(ws)
            bias = (
                table[rpi.reshape(-1)]
                .reshape(ws * ws, ws * ws, nh)
                .transpose(2, 0, 1)
            )
            mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
            # CAB consumes LN1(x) (same fp32-stats formula the kernel
            # applies internally); passing the pre-norm x + (g1, b1)
            # lets CAB apply the norm itself — via the Pallas LN feed,
            # or fully fused with its convs when cab_conv.ENABLE (the
            # megakernel re-derives LN1 in VMEM either way).
            conv_x = CAB(self.compress_ratio, self.squeeze_factor,
                         self.dtype, name="conv_block")(
                x, ln_scale=g1, ln_bias=b1)
            extra = conv_x * jnp.asarray(self.conv_scale, conv_x.dtype)
            scales = None
            if dp_active:
                keep = 1.0 - self.drop_path_rate
                k1, k2 = jax.random.split(self.make_rng("drop_path"))
                m1 = jax.random.bernoulli(k1, keep, (b,)) / keep
                m2 = jax.random.bernoulli(k2, keep, (b,)) / keep
                scales = jnp.stack([m1, m2], axis=1).astype(jnp.float32)
            xs = cyclic_shift(x.astype(self.dtype), shift)
            es = cyclic_shift(extra, shift)
            wargs = (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                     w1, bb1, w2, bb2)
            if megakernel_tpu_ok(ws, w):
                out = fused_swin_block(
                    xs, *wargs, bias.astype(jnp.float32),
                    ws, mask, (c // nh) ** -0.5, self.gelu_approximate,
                    extra=es, branch_scales=scales,
                )
                return cyclic_unshift(out, shift)
            # Packed-window megakernel: ws can't tile as strips on
            # Mosaic (megakernel_tpu_ok) — partition/pad in XLA, run
            # the whole block per G-window group in one Pallas program.
            from tpu_superresolution_tpu.ops.pallas import fused_block as _fb

            if _fb.SPATIAL_PACKED:
                # Spatial packed kernel: window-row blocks read straight
                # from the (rolled) spatial array — no XLA partition /
                # token pad / window pad / reverse around the block.
                # (branch_scales=None defaults to ones inside.)
                out = _fb.fused_spatial_windows_block(
                    xs, *wargs, bias.astype(jnp.float32), ws,
                    mask, (c // nh) ** -0.5, self.gelu_approximate,
                    extra=es, branch_scales=scales,
                )
                return cyclic_unshift(out, shift)

            n = ws * ws
            npad = (-n) % 8
            nW = (h // ws) * (w // ws)
            wpad = (-nW) % _fb.PACKED_GROUP
            xw = window_partition(xs, ws).reshape(b, nW, n, c)
            ew = window_partition(es, ws).reshape(b, nW, n, c)
            if wpad or npad:
                pads = ((0, 0), (0, wpad), (0, npad), (0, 0))
                xw = jnp.pad(xw, pads)
                ew = jnp.pad(ew, pads)
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
            if scales is None:
                scales = jnp.ones((b, 2), jnp.float32)
            out = fused_packed_windows_block(
                xw.reshape(b * (nW + wpad), n + npad, c), *wargs, bias_p,
                mask_p, (c // nh) ** -0.5, self.gelu_approximate,
                extra=ew.reshape(b * (nW + wpad), n + npad, c),
                branch_scales=scales,
            )
            out = out.reshape(b, nW + wpad, n + npad, c)[:, :nW, :n]
            out = window_reverse(out.reshape(b * nW, n, c), ws, h, w)
            return cyclic_unshift(out, shift)

        shortcut = x
        x = PLayerNorm(dtype=self.dtype, name="norm1")(x)

        conv_x = CAB(self.compress_ratio, self.squeeze_factor, self.dtype,
                     name="conv_block")(x)

        sx = cyclic_shift(x, shift)
        nwh, nww = h // ws, w // ws
        xw = window_partition(sx, ws).reshape(b, nwh * nww, ws * ws, c)
        mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        xw = WindowAttentionHAT(self.dim, ws, self.num_heads, self.qkv_bias,
                                self.attn_impl, self.dtype, name="attn")(xw, mask)
        attn_x = window_reverse(xw.reshape(-1, ws * ws, c), ws, h, w)
        attn_x = cyclic_unshift(attn_x, shift)

        # Stochastic depth on the attention residual only — the conv
        # branch is NOT dropped (reference hat_arch.py:307-308).
        use_dp = not deterministic and self.drop_path_rate > 0
        rng = self.make_rng("drop_path") if use_dp else None
        attn_x = drop_path(attn_x, self.drop_path_rate, rng is None, rng)
        x = shortcut + attn_x + conv_x * jnp.asarray(self.conv_scale, x.dtype)
        y = PLayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                gelu_approximate=self.gelu_approximate, name="mlp")(y)
        rng2 = self.make_rng("drop_path") if use_dp else None
        return x + drop_path(y, self.drop_path_rate, rng2 is None, rng2)


def _overlap_windows(x: jnp.ndarray, ws: int, ows: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, nW, ows*ows, C] overlapping windows at stride
    ws, zero-padded (torch nn.Unfold semantics, hat_arch.py:378,409).
    Index arrays are numpy trace-time constants."""
    b, h, w, c = x.shape
    diff = ows - ws
    p_lo = diff // 2
    p_hi = diff - p_lo
    xp = jnp.pad(x, ((0, 0), (p_lo, p_hi), (p_lo, p_hi), (0, 0)))
    nwh, nww = h // ws, w // ws
    row = ws * np.arange(nwh)[:, None] + np.arange(ows)[None]  # [nwh, ows]
    col = ws * np.arange(nww)[:, None] + np.arange(ows)[None]
    # gather rows then cols with static indices
    xr = xp[:, row]  # [B, nwh, ows, Wp, C]
    xrc = xr[:, :, :, col]  # [B, nwh, ows, nww, ows, C]
    xrc = xrc.transpose(0, 1, 3, 2, 4, 5)  # [B, nwh, nww, ows, ows, C]
    return xrc.reshape(b, nwh * nww, ows * ows, c)


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat_arch.py:353-439)."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    qkv_bias: bool
    mlp_ratio: float = 2.0
    attn_impl: str = "auto"
    gelu_approximate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        ws = self.window_size
        ows = int(self.overlap_ratio * ws) + ws
        nh = self.num_heads
        hd = c // nh

        from tpu_superresolution_tpu.ops.pallas import fused_ocab
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            resolve_attention_impl,
        )

        # Fused OCAB wins the train step but loses the inference forward
        # (PARITY round 3) -> gate on deterministic like the other paths.
        if (
            fused_ocab.ENABLE
            and (not deterministic or fused_ocab.INFERENCE_FUSED)
            and resolve_attention_impl(self.attn_impl) == "fused"
            and h % ws == 0
            and w % ws == 0
        ):
            return self._fused(x)

        shortcut = x
        x = PLayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=_TRUNC02,
                       dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        nwh, nww = h // ws, w // ws
        nw = nwh * nww
        qw = window_partition(q, ws).reshape(b, nw, ws * ws, c)
        kw = _overlap_windows(k, ws, ows)  # [B, nW, ows*ows, C]
        vw = _overlap_windows(v, ws, ows)

        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            fused_window_attention,
            resolve_attention_impl,
        )

        table = self.param("relative_position_bias_table", _TRUNC02,
                           ((ws + ows - 1) ** 2, nh))
        rpi = relative_position_index_oca(ws, ows)
        bias = table[rpi.reshape(-1)].reshape(ws * ws, ows * ows, nh)
        bias = bias.transpose(2, 0, 1)  # [nh, ws*ws, ows*ows]

        if resolve_attention_impl(self.attn_impl) == "pallas":
            qk = qw.reshape(b * nw, ws * ws, nh, hd).transpose(0, 2, 1, 3)
            kk = kw.reshape(b * nw, ows * ows, nh, hd).transpose(0, 2, 1, 3)
            vk = vw.reshape(b * nw, ows * ows, nh, hd).transpose(0, 2, 1, 3)
            out = fused_window_attention(
                qk, kk, vk, bias.astype(jnp.float32), None, scale=hd**-0.5
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, nw, ws * ws, c)
        else:
            qh = qw.reshape(b, nw, ws * ws, nh, hd)
            kh = kw.reshape(b, nw, ows * ows, nh, hd)
            vh = vw.reshape(b, nw, ows * ows, nh, hd)
            attn = jnp.einsum("bwqhd,bwkhd->bwhqk", qh * (hd**-0.5), kh)
            attn = attn + bias[None, None].astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, vh).reshape(b, nw, ws * ws, c)
        out = window_reverse(out.reshape(-1, ws * ws, c), ws, h, w)
        out = nn.Dense(c, kernel_init=_TRUNC02, dtype=self.dtype, name="proj")(out)
        x = out + shortcut
        y = PLayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                gelu_approximate=self.gelu_approximate, name="mlp")(y)
        return x + y

    def _fused(self, x):
        """Fused OCAB: the qkv GEMM (head-padded prepared weights) and
        the static overlap gather run as XLA ops; attention -> proj ->
        residual -> LN2 -> MLP -> residual run as ONE Pallas program per
        window group with a Pallas backward (ops/pallas/fused_ocab.py).
        Same parameter tree as the module path (checkpoints
        interchangeable).  Reference: hat_arch.py:353-439."""
        from tpu_superresolution_tpu.models.blocks import (
            DenseParams,
            LayerNormParams,
            MlpParams,
        )
        from tpu_superresolution_tpu.ops.pallas.fused_attention import (
            _prep_weights,
        )
        from tpu_superresolution_tpu.ops.pallas.fused_block import _ln
        from tpu_superresolution_tpu.ops.pallas.fused_ocab import (
            fused_ocab_core,
        )

        b, h, w, c = x.shape
        ws = self.window_size
        ows = int(self.overlap_ratio * ws) + ws
        nh = self.num_heads
        hd = c // nh
        dt = self.dtype

        g1, b1 = LayerNormParams(name="norm1")(c)
        wqkv, bqkv = DenseParams(3 * c, kernel_init=_TRUNC02,
                                 use_bias=self.qkv_bias, name="qkv")(c)
        wproj, bproj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
        g2, b2 = LayerNormParams(name="norm2")(c)
        w1, bb1, w2, bb2 = MlpParams(
            int(self.dim * self.mlp_ratio), self.dim, name="mlp"
        )(c)
        table = self.param("relative_position_bias_table", _TRUNC02,
                           ((ws + ows - 1) ** 2, nh))
        rpi = relative_position_index_oca(ws, ows)
        bias = table[rpi.reshape(-1)].reshape(ws * ws, ows * ows, nh)
        bias = bias.transpose(2, 0, 1)  # [nh, Nq, Nk]

        wprep, bqp, wp, _bp, hdp = _prep_weights(
            wqkv, bqkv, wproj, bproj, nh, hd**-0.5
        )
        koff = nh * hdp
        if hdp > hd:
            # ones-lane for MXU row sums (see fused_block._mega_forward);
            # re-planted after the gather because the overlap gather's
            # zero border padding zeroes it at image edges
            ones_cols = np.asarray([2 * koff + hh * hdp + hd for hh in range(nh)])
            bqp = bqp.at[0, ones_cols].set(1.0)

        from tpu_superresolution_tpu.ops.pallas.layernorm import (
            layernorm_spatial,
        )

        ln1 = layernorm_spatial(x.astype(dt), g1, b1)
        qkvp = ln1 @ wprep.astype(dt) + bqp.astype(dt)  # [B,H,W,3*koff]
        q_sec = qkvp[..., :koff]
        k_sec = qkvp[..., koff : 2 * koff]
        v_sec = qkvp[..., 2 * koff :]

        nwh, nww = h // ws, w // ws
        nw = nwh * nww
        nq, nk = ws * ws, ows * ows
        qw = window_partition(q_sec, ws).reshape(b * nw, nq, koff)
        kw = _overlap_windows(k_sec, ws, ows).reshape(b * nw, nk, koff)
        vw = _overlap_windows(v_sec, ws, ows).reshape(b * nw, nk, koff)
        if hdp > hd:
            lane = np.zeros((koff,), bool)
            lane[[hh * hdp + hd for hh in range(nh)]] = True
            vw = jnp.where(jnp.asarray(lane), jnp.asarray(1.0, vw.dtype), vw)
        sw = window_partition(x.astype(dt), ws).reshape(b * nw, nq, c)

        nqp = nq + (-nq) % 8
        nkp = nk + (-nk) % 8
        group = 8
        bwpad = (-(b * nw)) % group
        bias_p = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, nqp - nq), (0, nkp - nk)),
            constant_values=-1e9,
        )

        def pad3(a, ntok):
            return jnp.pad(
                a, ((0, bwpad), (0, ntok - a.shape[1]), (0, 0))
            )

        out_w = fused_ocab_core(
            pad3(qw, nqp), pad3(kw, nkp), pad3(vw, nkp), pad3(sw, nqp),
            wp, bproj, g2, b2, w1, bb1, w2, bb2, bias_p,
            nh, hd, gelu_approx=self.gelu_approximate,
            group=group,
        )
        out_w = out_w[: b * nw, :nq]
        return window_reverse(out_w, ws, h, w).astype(x.dtype)


class RHAG(nn.Module):
    """Residual hybrid attention group (hat_arch.py:538-620): depth x HAB
    (alternating shift) -> OCAB -> conv -> + input."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    qkv_bias: bool
    drop_path_rates: Tuple[float, ...] = ()
    resi_connection: str = "1conv"
    use_remat: bool = False
    attn_impl: str = "auto"
    gelu_approximate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        res = x
        hab_cls = nn.remat(HAB, static_argnums=(2,)) if self.use_remat else HAB
        for j in range(self.depth):
            x = hab_cls(
                self.dim, self.num_heads, self.window_size,
                0 if j % 2 == 0 else self.window_size // 2,
                self.compress_ratio, self.squeeze_factor, self.conv_scale,
                self.mlp_ratio, self.qkv_bias,
                self.drop_path_rates[j] if self.drop_path_rates else 0.0,
                self.attn_impl, self.gelu_approximate, self.dtype,
                name=f"blocks_{j}",
            )(x, deterministic)
        x = OCAB(self.dim, self.window_size, self.overlap_ratio,
                 self.num_heads, self.qkv_bias, self.mlp_ratio,
                 self.attn_impl, self.gelu_approximate, self.dtype,
                 name="overlap_attn")(x, deterministic)
        if self.resi_connection == "1conv":
            x = Conv3x3(self.dim, dtype=self.dtype, name="conv")(x)
        # 'identity' -> no conv
        return x + res


class HAT(nn.Module):
    config: HATConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = self.dtype
        h_in, w_in = x.shape[1], x.shape[2]
        x = x.astype(dt)
        x = check_image_size(x, cfg.window_size)

        if cfg.in_channels == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], dtype=dt)
        else:
            mean = jnp.zeros((cfg.in_channels,), dtype=dt)
        x = (x - mean) * cfg.img_range

        from tpu_superresolution_tpu.models import blocks as _blocks

        x = Conv3x3(cfg.embed_dim, dtype=dt,
                    impl=_blocks.CONV3X3_INPUT_IMPL, name="conv_first")(x)

        feats = x
        if cfg.patch_norm:  # hat_arch.py:758 default
            feats = PLayerNorm(dtype=dt, name="patch_norm")(feats)
        # stochastic depth decay rule (hat_arch.py:827)
        dpr = [float(r) for r in np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))]
        start = 0
        for i, depth in enumerate(cfg.depths):
            feats = RHAG(
                cfg.embed_dim, depth, cfg.num_heads[i], cfg.window_size,
                cfg.compress_ratio, cfg.squeeze_factor, cfg.conv_scale,
                cfg.overlap_ratio, cfg.mlp_ratio, cfg.qkv_bias,
                tuple(dpr[start : start + depth]),
                cfg.resi_connection, cfg.use_remat, cfg.attention_impl,
                cfg.gelu_approximate, dt,
                name=f"layers_{i}",
            )(feats, deterministic=not train)
            start += depth
        feats = PLayerNorm(dtype=dt, name="norm")(feats)
        if cfg.resi_connection == "1conv":
            feats = Conv3x3(cfg.embed_dim, dtype=dt, name="conv_after_body")(feats)
        x = feats + x

        # only 'pixelshuffle' reconstruction exists in the reference
        x = Conv3x3(cfg.num_feat, dtype=dt, name="conv_before_upsample")(x)
        x = nn.leaky_relu(x, 0.01)
        x = upsample_and_last(
            self, x, cfg.scale, cfg.num_feat, cfg.out_channels, dt,
            fused=cfg.fused_reconstruct,
        )

        x = x / cfg.img_range + mean
        return x[:, : h_in * cfg.scale, : w_in * cfg.scale, :]


def build_hat(config: HATConfig, dtype=jnp.float32) -> HAT:
    return HAT(config=config, dtype=dtype)


register_model("hat", HATConfig, build_hat)
# Framework-native fast preset (ws=8) — see HATFastConfig's docstring.
register_model("hat_fast", HATFastConfig, build_hat)

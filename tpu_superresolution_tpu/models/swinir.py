"""SwinIR — window-attention SR transformer, TPU-native (NHWC Flax).

Capability parity with the reference ``modules/network_swinir.py:618-851``
(classical SwinIR-M is what the reference fine-tunes —
finetune_swinir.py:269-281), re-designed for XLA:

- Features stay spatial [B, H, W, C] end-to-end (no [B, L, C] flatten
  round-trips — PatchEmbed/PatchUnEmbed at patch_size=1 are pure layout
  churn on TPU; LayerNorm acts on the trailing channel axis directly).
- All shapes static under jit: the shifted-window mask and the
  relative-position gather index are numpy trace-time constants
  (ops/window.py), not buffers with a dynamic-recompute path (the
  reference recomputes masks when sizes differ —
  network_swinir.py:259-262 — an XLA-hostile pattern; here every traced
  size gets its mask for free at trace time).
- Attention is a batched einsum over [B, nW, heads, N, N]; bf16 compute,
  fp32 softmax accumulation.  A fused Pallas kernel can replace the
  inner attention via ops/pallas (same layout).
- Reflect-pad to window multiples + crop to (H*s, W*s) preserved
  (network_swinir.py:783-788, 840).

Module names mirror the torch checkpoint layout ('.' -> '_') so
interop/torch_convert.py maps official pretrained checkpoints (the
``params``-key wrapper handled there, finetune_swinir.py:283-285).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import SwinIRConfig, register_model
from tpu_superresolution_tpu.models.blocks import (
    AttnParams as _AttnParams,
    Conv3x3,
    DenseParams,
    LayerNormParams,
    Mlp,
    MlpParams,
    PLayerNorm,
    PixelShuffleDirect,
    PixelShuffleUpsample,
    check_image_size,
    drop_path,
    upsample_and_last,
)
from tpu_superresolution_tpu.ops.window import (
    cyclic_shift,
    cyclic_unshift,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)

Dtype = Any

_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
_LN_EPS = 1e-5  # torch nn.LayerNorm default; flax default is 1e-6


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias
    (reference network_swinir.py:65-145).

    Three interchangeable paths sharing one parameter tree (explicit
    {kernel, bias} params identical to nn.Dense's):
    - "fused" (TPU production): ONE Pallas kernel runs qkv projection +
      bias/mask attention + output projection in VMEM
      (ops/pallas/fused_attention.py) — the jnp path's bias/mask adds
      make XLA materialize the [B*nW, nH, N, N] attention tensor in a
      30-lane-padded HBM layout.
    - "jnp": batched einsums (CPU / parity oracle).
    - "pallas": the round-1 window-packing kernel (kept selectable).
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_impl: str = "auto"  # "auto" | "jnp" | "pallas" | "fused"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None):
        """x: [B, nW, N, C]; mask: [nW, N, N] numpy constant or None."""
        from tpu_superresolution_tpu.ops.pallas.fused_attention import (
            fused_window_block_attention,
        )
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            fused_window_attention,
            resolve_attention_impl,
        )

        b, nw, n, c = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5
        dt = self.dtype

        wqkv, bqkv = DenseParams(
            3 * c, kernel_init=_TRUNC02, use_bias=self.qkv_bias, name="qkv"
        )(c)
        wproj, bproj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)

        table = self.param(
            "relative_position_bias_table",
            _TRUNC02,
            ((2 * ws - 1) ** 2, nh),
        )
        rpi = relative_position_index(ws)  # numpy [N, N]
        bias = table[rpi.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)

        impl = resolve_attention_impl(self.attn_impl)
        if impl == "fused":
            # Pad the window count to a multiple of 8 so the packed
            # kernel can group >1 window per program even when nW has no
            # small divisors (e.g. 37^2=1369 at HAT's 259x259); dead
            # windows are zero tokens whose outputs are sliced off, and
            # the mask stream is padded in step so real windows keep
            # their own mask rows.
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
                bias.astype(jnp.float32), mk, scale,
            )
            out = out.reshape(b, nw + nw_pad, n, c)
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
                bias.astype(jnp.float32), m, scale=scale,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, nw, n, c)
        else:
            # [B, nW, N, nh, hd] -> attention over N
            attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q * scale, k)
            attn = attn + bias[None, None].astype(attn.dtype)
            if mask is not None:
                attn = attn + jnp.asarray(mask, dtype=attn.dtype)[None, :, None]
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, v)
            out = out.reshape(b, nw, n, c)
        out = out @ wproj.astype(dt) + bproj.astype(dt)
        return out


class SwinBlock(nn.Module):
    """Swin transformer block: (shifted) W-MSA + MLP
    (reference network_swinir.py:164-279).

    On TPU at inference (and drop-path-free training) the WHOLE block
    runs as one Pallas megakernel (ops/pallas/fused_block.py): LN1 ->
    qkv -> masked window attention -> proj -> residual -> LN2 -> MLP ->
    residual in VMEM, with window partition/reverse replaced by
    trace-time permuted bias/mask tables.  The cyclic roll stays
    outside (it commutes with every pointwise op)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    attn_impl: str = "auto"
    gelu_approximate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, coord_in: int = 0,
                 absorb: bool = False):
        """`absorb`/`coord_in` (fused_block.ABSORB_ROLLS): the caller
        (RSTB) threads the stored-coordinate shift through its block
        sequence; this block reads at the offset (shift - coord_in)
        inside the megakernel instead of rolling, and returns
        (out, coord_out) with its output left in compute coordinates.
        Any fallback path first restores true coordinates and returns
        coord_out=0."""
        from tpu_superresolution_tpu.ops.pallas.fused_block import (
            fused_swin_block,
        )
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            resolve_attention_impl,
        )

        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size
        # Reference rule (network_swinir.py:193-196): if the resolution is
        # <= window size, don't partition/shift.  Applied on the static
        # trace shape.
        if min(h, w) <= ws:
            ws = min(h, w)
            shift = 0

        from tpu_superresolution_tpu.ops.pallas.fused_block import (
            megakernel_tpu_ok,
        )

        dp_active = (not deterministic) and self.drop_path_rate > 0
        fused_ok = (
            resolve_attention_impl(self.attn_impl) == "fused"
            and h % ws == 0
            and w % ws == 0
            and megakernel_tpu_ok(ws, w)
        )
        # Roll absorption is differentiable (custom_vjp rolls only in
        # the backward); drop-path training keeps the explicit-roll
        # kernel unless ABSORB_TRAIN — the absorb x branch_scales cross
        # rides the same read_shift custom_vjp (scales pass through).
        from tpu_superresolution_tpu.ops.pallas.fused_block import (
            ABSORB_TRAIN,
        )

        do_absorb = absorb and fused_ok and (not dp_active or ABSORB_TRAIN)
        if absorb and not do_absorb and coord_in:
            x = cyclic_unshift(x, coord_in)
            coord_in = 0
        if fused_ok:
            nh = self.num_heads
            wqkv, bqkv, wproj, bproj, table = _AttnParams(
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
            scales = None
            if dp_active:
                # Stochastic depth stays OUTSIDE the kernel math: sample
                # the per-sample mask/keep multipliers here and let the
                # kernel scale each residual branch (hat_arch.py:12-38).
                keep = 1.0 - self.drop_path_rate
                k1, k2 = jax.random.split(self.make_rng("drop_path"))
                m1 = jax.random.bernoulli(k1, keep, (b,)) / keep
                m2 = jax.random.bernoulli(k2, keep, (b,)) / keep
                scales = jnp.stack([m1, m2], axis=1).astype(jnp.float32)
            if do_absorb:
                out = fused_swin_block(
                    x.astype(self.dtype), g1, b1, wqkv, bqkv, wproj,
                    bproj, g2, b2, w1, bb1, w2, bb2,
                    bias.astype(jnp.float32),
                    ws, mask, (c // nh) ** -0.5, self.gelu_approximate,
                    branch_scales=scales, read_shift=shift - coord_in,
                )
                return out, shift
            xs = cyclic_shift(x.astype(self.dtype), shift)
            out = fused_swin_block(
                xs, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                w1, bb1, w2, bb2, bias.astype(jnp.float32),
                ws, mask, (c // nh) ** -0.5, self.gelu_approximate,
                branch_scales=scales,
            )
            out = cyclic_unshift(out, shift)
            return (out, 0) if absorb else out

        shortcut = x
        x = PLayerNorm(dtype=self.dtype, name="norm1")(x)
        x = cyclic_shift(x, shift)
        nwh, nww = h // ws, w // ws
        xw = window_partition(x, ws).reshape(b, nwh * nww, ws * ws, c)
        mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        xw = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.attn_impl,
            self.dtype, name="attn"
        )(xw, mask)
        x = window_reverse(xw.reshape(-1, ws * ws, c), ws, h, w)
        x = cyclic_unshift(x, shift)

        rng = (
            self.make_rng("drop_path")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = shortcut + drop_path(x, self.drop_path_rate, deterministic or rng is None, rng)
        y = PLayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                gelu_approximate=self.gelu_approximate, name="mlp")(y)
        rng2 = (
            self.make_rng("drop_path")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        out = x + drop_path(
            y, self.drop_path_rate, deterministic or rng2 is None, rng2
        )
        return (out, 0) if absorb else out


class RSTB(nn.Module):
    """Residual Swin Transformer Block group: depth x SwinBlock ->
    conv3x3 -> + input (reference network_swinir.py:419-482; BasicLayer
    folded in — it only iterated blocks)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop_path_rates: Tuple[float, ...]
    resi_connection: str = "1conv"
    use_remat: bool = False
    attn_impl: str = "auto"
    gelu_approximate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from tpu_superresolution_tpu.ops.pallas import fused_block as _fb

        res = x
        block_cls = SwinBlock
        if self.use_remat:
            block_cls = nn.remat(SwinBlock, static_argnums=(2,))
        # Roll absorption (fused_block.ABSORB_ROLLS): thread the stored-
        # coordinate shift through the block sequence — each fused block
        # reads at its (shift - coord) offset instead of rolling, and
        # ONE roll at the layer tail restores true coordinates
        # (replaces two rolls per shifted block).  Training forwards
        # absorb too when ABSORB_TRAIN is on (A/B-gated); remat wraps
        # the call signature, so it opts out.
        absorb = (
            _fb.ABSORB_ROLLS
            and not self.use_remat
            and (deterministic or _fb.ABSORB_TRAIN)
        )
        coord = 0
        for j in range(self.depth):
            blk = block_cls(
                self.dim,
                self.num_heads,
                self.window_size,
                0 if j % 2 == 0 else self.window_size // 2,
                self.mlp_ratio,
                self.qkv_bias,
                self.drop_path_rates[j],
                self.attn_impl,
                self.gelu_approximate,
                self.dtype,
                name=f"blocks_{j}",
            )
            if absorb:
                x, coord = blk(x, deterministic, coord, True)
            else:
                x = blk(x, deterministic)
        if coord:
            x = cyclic_unshift(x, coord)
        if self.resi_connection == "1conv":
            x = Conv3x3(self.dim, dtype=self.dtype, name="conv")(x)
        else:  # 3conv bottleneck (network_swinir.py:466-471)
            x = Conv3x3(self.dim // 4, dtype=self.dtype, name="conv_0")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(self.dim // 4, (1, 1), dtype=self.dtype, name="conv_2")(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv3x3(self.dim, dtype=self.dtype, name="conv_4")(x)
        return x + res


class SwinIR(nn.Module):
    """Full SwinIR (reference network_swinir.py:618-851)."""

    config: SwinIRConfig
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
        x_norm_in = x

        # 1. shallow feature extraction
        from tpu_superresolution_tpu.models import blocks as _blocks

        x = Conv3x3(cfg.embed_dim, dtype=dt,
                    impl=_blocks.CONV3X3_INPUT_IMPL, name="conv_first")(x)

        # 2. deep feature extraction
        feats = x
        if cfg.patch_norm:
            feats = PLayerNorm(dtype=dt, name="patch_norm")(feats)
        if cfg.ape:
            # absolute position embedding over the init-resolution token
            # grid (network_swinir.py:693-696)
            ape = self.param(
                "absolute_pos_embed",
                _TRUNC02,
                (cfg.img_size, cfg.img_size, cfg.embed_dim),
            )
            feats = feats + ape[None].astype(dt)

        # Stochastic-depth linear decay rule (network_swinir.py:701):
        # rates 0 -> drop_path_rate across all blocks; active only when
        # train=True (inference parity unaffected).
        total_depth = sum(cfg.depths)
        dpr = [float(r) for r in np.linspace(0, cfg.drop_path_rate, total_depth)]
        start = 0
        for i, depth in enumerate(cfg.depths):
            feats = RSTB(
                cfg.embed_dim,
                depth,
                cfg.num_heads[i],
                cfg.window_size,
                cfg.mlp_ratio,
                cfg.qkv_bias,
                tuple(dpr[start : start + depth]),
                cfg.resi_connection,
                cfg.use_remat,
                cfg.attention_impl,
                cfg.gelu_approximate,
                dt,
                name=f"layers_{i}",
            )(feats, deterministic=not train)
            start += depth
        feats = PLayerNorm(dtype=dt, name="norm")(feats)
        if cfg.resi_connection == "1conv":
            feats = Conv3x3(cfg.embed_dim, dtype=dt, name="conv_after_body")(feats)
        else:
            feats = Conv3x3(cfg.embed_dim // 4, dtype=dt, name="conv_after_body_0")(feats)
            feats = nn.leaky_relu(feats, 0.2)
            feats = nn.Conv(cfg.embed_dim // 4, (1, 1), dtype=dt, name="conv_after_body_2")(feats)
            feats = nn.leaky_relu(feats, 0.2)
            feats = Conv3x3(cfg.embed_dim, dtype=dt, name="conv_after_body_4")(feats)
        x = feats + x

        # 3. reconstruction
        if cfg.upsampler == "pixelshuffle":
            x = Conv3x3(cfg.num_feat, dtype=dt, name="conv_before_upsample")(x)
            x = nn.leaky_relu(x, 0.01)  # torch nn.LeakyReLU default slope
            x = upsample_and_last(
                self, x, cfg.scale, cfg.num_feat, cfg.out_channels, dt,
                fused=cfg.fused_reconstruct,
            )
        elif cfg.upsampler == "pixelshuffledirect":
            x = PixelShuffleDirect(cfg.scale, cfg.out_channels, dt, name="upsample")(x)
        elif cfg.upsampler == "nearest+conv":
            x = Conv3x3(cfg.num_feat, dtype=dt, name="conv_before_upsample")(x)
            x = nn.leaky_relu(x, 0.01)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.leaky_relu(
                Conv3x3(cfg.num_feat, dtype=dt, name="conv_up1")(x), 0.2
            )
            if cfg.scale == 4:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.leaky_relu(
                    Conv3x3(cfg.num_feat, dtype=dt, name="conv_up2")(x), 0.2
                )
            x = nn.leaky_relu(
                Conv3x3(cfg.num_feat, dtype=dt, name="conv_hr")(x), 0.2
            )
            x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_last")(x)
        else:  # denoise / artifact-reduction: input + conv_last(body)
            # (network_swinir.py:832-836)
            x = x_norm_in + nn.Conv(
                cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_last"
            )(x)

        x = x / cfg.img_range + mean
        out_scale = cfg.scale if cfg.upsampler else 1
        return x[:, : h_in * out_scale, : w_in * out_scale, :]


def build_swinir(config: SwinIRConfig, dtype=jnp.float32) -> SwinIR:
    return SwinIR(config=config, dtype=dtype)


register_model("swinir", SwinIRConfig, build_swinir)

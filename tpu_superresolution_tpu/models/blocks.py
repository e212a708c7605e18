"""Shared building blocks for all model families.

Unlike the reference — which copy-pastes Mlp/window helpers/Upsample into
every architecture file (network_swinir.py:33-62 vs hat_arch.py:98-127,
dat_arch.py:655-696) — these are defined once.  Everything is NHWC,
static-shape, and jit-friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_superresolution_tpu.ops.pixelshuffle import pixel_shuffle

Dtype = Any


def conv_transpose_torchlike(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose2d semantics on NHWC.

    torch ConvTranspose2d(k, s, p) == conv(input dilated by s, spatially
    flipped kernel, pad k-1-p) giving out = (in-1)*s - 2p + k.  Needed for
    MS_ResUNet's upCT{2,3,4} (reference ms_resunet.py:106-108).

    w: [kh, kw, C_out, C_in]  (we store transpose-conv kernels with
    output-features on axis 2 so torch's [C_in, C_out, kh, kw] maps by
    transpose(2, 3, 1, 0)).
    """
    kh, kw = w.shape[0], w.shape[1]
    w_flip = w[::-1, ::-1, :, :]
    # After flip: contract over C_in (axis 3) -> dimension_numbers with
    # kernel layout HWOI == ("NHWC", "HWOI", "NHWC") is not standard;
    # transpose to HWIO.
    w_hwio = w_flip.transpose(0, 1, 3, 2)  # [kh, kw, C_in, C_out]
    pad_h = kh - 1 - padding
    pad_w = kw - 1 - padding
    return jax.lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d(k, s, p) with torch-compatible weights."""

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, self.features, in_ch),
            self.param_dtype,
        )
        y = conv_transpose_torchlike(
            x.astype(self.dtype), w.astype(self.dtype), self.stride, self.padding
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + b.astype(self.dtype)
        return y


# Whole-model A/B switch for Conv3x3 (measurement scripts flip it);
# per-module `impl=` overrides it.  "halo" = the one-read Pallas kernel
# (ops/pallas/cab_conv.conv3x3_halo), which self-gates: VMEM-squeezed
# shapes (e.g. 256^2 whole images) fall back to the XLA conv op, which
# measured best there (46.52 vs gemm 52.16 ms whole-SwinIR).  Flipped
# per conv_halo_flip_ab (2026-08-19, v5e): bench shape b25/t64
# halo+first+up 53.28 vs xla 55.20 ms min (-3.5%), DAT/HAT trunks ride
# the same switch; gemm loses at both shapes (84.91 at b25).
CONV3X3_IMPL = "halo"

# Input-layer (Cin=3) convs route separately (K=3 GEMMs waste MXU
# lanes, so they may behave differently).  Back to "xla"
# (2026-08-19b): the Cin=3 halo kernel's VMEM estimate is unmodelable
# (lane-padded 3->128 per-tap reshape copies; HAT 70x70 conv_first
# compiled to 17.15 MB scoped stack vs a 1.8 MB estimate and CRASHED
# remote Mosaic at model.init), and its measured edge was ~0.5%
# (b25 halo+first 53.68 vs halo-only 53.96, conv_halo_flip_ab) —
# below the flip bar.  conv3x3_halo also self-refuses cin<8 so stale
# "halo" settings cannot crash a compile.
CONV3X3_INPUT_IMPL = "xla"


# Depthwise-conv impl switch (same A/B pattern as CONV3X3_IMPL);
# "xla" until the on-chip A/B proves the halo kernel for DAT.
DWCONV3X3_IMPL = "xla"


class DWConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(C, (3,3), SAME, feature_group_count=C)``
    (identical {kernel [3,3,1,C], bias} param tree) with a selectable
    one-read Pallas implementation (ops/pallas/cab_conv.dwconv3x3_halo)
    — DAT runs a depthwise conv per SGFN and per spatial-attention
    conv branch at B=1 between other ops, the same in-model conv-op
    pathology measured for HAT (PARITY.md round 3)."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    impl: Optional[str] = None  # None -> module global DWCONV3X3_IMPL

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        impl = DWCONV3X3_IMPL if self.impl is None else self.impl
        x = x.astype(self.dtype)
        if impl == "halo":
            from tpu_superresolution_tpu.ops.pallas.cab_conv import (
                dwconv3x3_halo,
            )

            return dwconv3x3_halo(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features,
        )
        return y + bias.astype(self.dtype)


class Conv3x3Params(nn.Module):
    """nn.Conv-compatible {kernel, bias} params, returned raw — for
    fused kernels that consume the conv weights directly while the
    checkpoint tree stays identical to nn.Conv / Conv3x3."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, in_features, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), SAME)`` — identical
    {kernel, bias} param tree — that computes the conv as nine shifted
    GEMMs (ops/conv_gemm.py) by default.

    Why: XLA's conv op at the transformer-trunk shapes (NHWC, B=1,
    C 64-180) interleaved with Pallas megakernel calls measures
    ~30-40x its roofline in-model (PARITY.md round 3: the two CAB
    convs cost HAT ~6 ms; the same fix measured 93.0 -> 87.0 ms whole
    forward).  ``impl="xla"`` keeps the conv op selectable for A/B.
    Input-layer convs (Cin=3) stay on ``nn.Conv`` — K=3 GEMMs waste
    the MXU and the conv op handles the channel pad itself.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    impl: Optional[str] = None  # None -> module global CONV3X3_IMPL

    @nn.compact
    def __call__(self, x):
        from tpu_superresolution_tpu.ops.conv_gemm import conv3x3_gemm

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        impl = CONV3X3_IMPL if self.impl is None else self.impl
        x = x.astype(self.dtype)
        if impl == "gemm":
            return conv3x3_gemm(x, kernel, bias)
        if impl == "halo":
            from tpu_superresolution_tpu.ops.pallas.cab_conv import (
                conv3x3_halo,
            )

            return conv3x3_halo(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class DenseParams(nn.Module):
    """Declares nn.Dense-compatible {kernel, bias} params and returns
    them raw — used where a fused Pallas kernel consumes the projection
    weights directly while keeping the checkpoint tree identical to
    nn.Dense (interop/torch_convert mappings unchanged)."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias
            else None
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    """nn.LayerNorm-compatible {scale, bias} params, returned raw (for
    fused kernels that run the normalization in VMEM)."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: int):
        scale = self.param(
            "scale", nn.initializers.ones, (features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), self.param_dtype
        )
        return scale, bias


class PLayerNorm(nn.Module):
    """Drop-in for `nn.LayerNorm(epsilon=1e-5)` (same param names /
    shapes / fast-variance formula, so checkpoints and golden parity
    are unaffected) that routes to the one-pass Pallas kernel on TPU.
    XLA's layernorm lowering measured ~20x its HBM roofline at
    production spatial shapes (PARITY.md round 3); DAT alone runs 30+
    of them per forward (dat_arch.py:531-565).  ``impl="xla"`` keeps
    the jnp formula selectable for models where XLA fuses the LN into
    neighbouring ops better than a separate Pallas call."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    impl: Optional[str] = None  # None -> "pallas"; "xla" -> jnp formula

    @nn.compact
    def __call__(self, x):
        from tpu_superresolution_tpu.ops.pallas.fused_block import _ln
        from tpu_superresolution_tpu.ops.pallas.layernorm import (
            layernorm_spatial,
        )

        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.param_dtype
        )
        x = x.astype(self.dtype)
        if self.impl == "xla":
            return _ln(x.astype(jnp.float32), scale, bias).astype(x.dtype)
        return layernorm_spatial(x, scale, bias)


class MlpParams(nn.Module):
    """Mlp-compatible fc1/fc2 {kernel, bias} params, returned raw."""

    hidden_features: int
    out_features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        w1, b1 = DenseParams(
            self.hidden_features, param_dtype=self.param_dtype, name="fc1"
        )(in_features)
        w2, b2 = DenseParams(
            self.out_features, param_dtype=self.param_dtype, name="fc2"
        )(self.hidden_features)
        return w1, b1, w2, b2


_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class AttnParams(nn.Module):
    """Declares a window-attention module's exact parameter tree
    (qkv/proj Dense + relative_position_bias_table) and returns the raw
    tensors — the fused-block megakernel consumes them directly while
    checkpoints stay byte-compatible with the module path (SwinIR's
    WindowAttention, HAT's WindowAttentionHAT share this layout:
    network_swinir.py:78-112, hat_arch.py:130-197)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        c = self.dim
        wqkv, bqkv = DenseParams(
            3 * c, kernel_init=_TRUNC02, use_bias=self.qkv_bias, name="qkv"
        )(c)
        wproj, bproj = DenseParams(c, kernel_init=_TRUNC02, name="proj")(c)
        table = self.param(
            "relative_position_bias_table",
            _TRUNC02,
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        return wqkv, bqkv, wproj, bproj, table


class Mlp(nn.Module):
    """2-layer GELU MLP (reference network_swinir.py:14-30).

    `gelu_approximate=True` swaps the exact erf gelu for the tanh
    approximation — measured ~14 ms faster per SwinIR-M 256x256 forward
    on v5e (erf is transcendental-heavy on the VPU); default stays exact
    for bit-level parity with torch checkpoints.
    """

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dense(self.out_features, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(x)
        return x


class MeanShift(nn.Module):
    """Fixed mean-shift normalize/denormalize (reference
    network_swinir.py:659-660,809-810: subtract dataset RGB mean, scale by
    img_range, add back after reconstruction)."""

    rgb_mean: Tuple[float, ...]
    img_range: float = 1.0

    def setup(self):
        self.mean = jnp.asarray(self.rgb_mean, dtype=jnp.float32)

    def normalize(self, x):
        return (x - self.mean.astype(x.dtype)) * jnp.asarray(
            self.img_range, dtype=x.dtype
        )

    def denormalize(self, x):
        return x / jnp.asarray(self.img_range, dtype=x.dtype) + self.mean.astype(x.dtype)


class PixelShuffleUpsample(nn.Module):
    """log2-chained (conv 4C -> depth-to-space x2) upsampler, or the x3
    variant (reference network_swinir.py:572-591)."""

    scale: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        s = self.scale
        if (s & (s - 1)) == 0:  # power of 2
            for i in range(int(math.log2(s))):
                x = nn.Conv(
                    4 * self.features,
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv_{i}",
                )(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = nn.Conv(
                9 * self.features,
                (3, 3),
                padding=((1, 1), (1, 1)),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv_0",
            )(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {s} not supported (2^n or 3)")
        return x


class PixelShuffleDirect(nn.Module):
    """One conv to s^2*C_out then a single depth-to-space (reference
    UpsampleOneStep, network_swinir.py:594-615)."""

    scale: int
    out_features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.scale**2 * self.out_features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        return pixel_shuffle(x, self.scale)


def upsample_and_last(
    mdl: nn.Module,
    x: jnp.ndarray,
    scale: int,
    num_feat: int,
    out_channels: int,
    dt: Dtype,
    fused: bool,
) -> jnp.ndarray:
    """The reconstruction tail shared by SwinIR/HAT/DAT's 'pixelshuffle'
    mode: Upsample (conv->PixelShuffle chain, network_swinir.py:572-591)
    followed by conv_last.  The chain is purely linear (no activation
    between its convs), so with `fused=True` it is collapsed at trace
    time into ONE low-res conv + ONE pixel_shuffle
    (ops/fused_upsample.py) — same parameter tree, checkpoints are
    interchangeable; exact on the interior, differs from the chain on a
    border ring of up to ~3 LOW-RES pixels, i.e. 3*scale output pixels
    (12 output px at x4), which the tiler feather-blends away.

    Must be called from the owning module's compact __call__ (params are
    declared on `mdl` under the usual 'upsample'/'conv_last' names).
    """
    import math

    if scale == 1:
        # No upsampling stages to compose — the fused path would build an
        # empty conv chain; the plain conv_last is already minimal.
        fused = False
    if not fused:
        x = PixelShuffleUpsample(scale, num_feat, dt, name="upsample")(x)
        return nn.Conv(
            out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_last"
        )(x)

    from tpu_superresolution_tpu.ops.fused_upsample import (
        fused_pixelshuffle_reconstruct,
    )

    if (scale & (scale - 1)) == 0:
        rhos = [2] * int(math.log2(scale))
    elif scale == 3:
        rhos = [3]
    else:
        raise ValueError(f"scale {scale} not supported (2^n or 3)")

    lecun = nn.initializers.lecun_normal()

    def _up_init(key):
        ks = jax.random.split(key, len(rhos))
        return {
            f"conv_{i}": {
                "kernel": lecun(ks[i], (3, 3, num_feat, r * r * num_feat)),
                "bias": jnp.zeros((r * r * num_feat,), jnp.float32),
            }
            for i, r in enumerate(rhos)
        }

    def _last_init(key):
        return {
            "kernel": lecun(key, (3, 3, num_feat, out_channels)),
            "bias": jnp.zeros((out_channels,), jnp.float32),
        }

    up = mdl.param("upsample", _up_init)
    last = mdl.param("conv_last", _last_init)
    stages = [
        (up[f"conv_{i}"]["kernel"], up[f"conv_{i}"]["bias"], r)
        for i, r in enumerate(rhos)
    ]
    return fused_pixelshuffle_reconstruct(
        x, stages, (last["kernel"], last["bias"]), dtype=dt
    )


def check_image_size(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Reflect-pad H, W up to the next multiple (reference
    network_swinir.py:783-788).  Shapes are static under jit."""
    h, w = x.shape[1], x.shape[2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        # torch F.pad mode='reflect' excludes the edge pixel, matching
        # jnp.pad mode='reflect'.
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth (reference hat_arch.py:12-38).  Per-sample drop of
    the residual branch; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))

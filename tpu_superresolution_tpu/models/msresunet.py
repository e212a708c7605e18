"""MS_ResUNet — RefineNet-style restoration CNN, TPU-native (NHWC Flax).

Capability parity with the reference ``modules/ms_resunet.py``:

- Stem: 5x5 stride-1 **pad-1** conv (shrinks H,W by 2 — ms_resunet.py:101),
  compensated by the head's 3x3 **pad-2** conv (grows H,W by 2 —
  ms_resunet.py:149).  Same-size restoration net: [B,H,W,1] -> [B,H,W,1];
  the x2/x4 SR factor is handled by the data pipeline's bicubic
  pre-upscale (sr_transforms.py:55-63).
- Encoder: 4 Bottleneck stages (expansion 4) at strides 1,2,2,2 with
  128/256/512/1024 output channels (ms_resunet.py:111-114).
- Decoder: 4 refine stages = dimred conv -> RCU adapt -> fuse with
  upsampled deeper path -> chained residual pooling (RCPB) -> RCU ->
  dimred (ms_resunet.py:206-255); upsampling via ConvTranspose k4 s2 p1 +
  center-crop to the skip size (ms_resunet.py:106-108,151-168).

Param count matches the reference: 24,918,369 (model_debug.ipynb cell 7).
Module names mirror the torch checkpoint keys ('.' -> '_') so the interop
converter is a mechanical table (interop/torch_convert.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_superresolution_tpu.core.config import MSResUNetConfig, register_model
from tpu_superresolution_tpu.models.blocks import ConvTranspose2dTorch

Dtype = Any


def _conv3x3(features, name, dtype, use_bias=False):
    return nn.Conv(
        features,
        (3, 3),
        padding=((1, 1), (1, 1)),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class RCPB(nn.Module):
    """Chained residual pooling (ms_resunet.py:12-30): n_stages of
    (maxpool 5x5 s1 p2 -> conv3x3), each stage re-added to the running sum."""

    features: int
    n_stages: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        top = x
        for i in range(self.n_stages):
            top = nn.max_pool(
                top, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2))
            )
            top = _conv3x3(self.features, f"conv{i + 1}", self.dtype)(top)
            x = top + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (ms_resunet.py:35-55): n_blocks x n_stages of
    ReLU->conv3x3 with a residual add per block; bias only on stage 0."""

    features: int
    n_blocks: int = 2
    n_stages: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = nn.relu(x)
                x = _conv3x3(
                    self.features,
                    f"b{i + 1}s{j + 1}",
                    self.dtype,
                    use_bias=(j == 0),
                )(x)
            x = x + residual
        return x


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4, BatchNorm (ms_resunet.py:57-93)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            residual = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


def _crop_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Center-crop x (NHWC) to ref's spatial size (ms_resunet.py:151-168)."""
    h, w = x.shape[1], x.shape[2]
    hr, wr = ref.shape[1], ref.shape[2]
    if h == hr and w == wr:
        return x
    dh, dw = h - hr, w - wr
    return x[:, dh // 2 : h - (dh - dh // 2), dw // 2 : w - (dw - dw // 2), :]


class RefineStage(nn.Module):
    """One decoder refine stage: dimred -> RCU adapt [-> adapt dimred]
    -> (+ deeper) -> relu -> RCPB -> RCU -> [out dimred]."""

    features: int
    in_dimred_from: int  # unused, documentation only
    adapt_blocks: int = 2
    mflow_blocks: int = 3
    has_adapt_dimred: bool = True  # stages 2-4 have an extra joint dimred
    has_out_dimred: bool = True  # last stage has no output dimred
    out_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, deeper=None):
        x = _conv3x3(self.features, "dimred", self.dtype)(skip)
        x = RCUBlock(self.features, self.adapt_blocks, 2, self.dtype, name="adapt")(x)
        if self.has_adapt_dimred:
            x = _conv3x3(self.features, "adapt_dimred", self.dtype)(x)
        if deeper is not None:
            x = x + deeper
        x = nn.relu(x)
        x = RCPB(self.features, 4, self.dtype, name="pool")(x)
        x = RCUBlock(self.features, self.mflow_blocks, 2, self.dtype, name="mflow")(x)
        if self.has_out_dimred:
            x = _conv3x3(self.out_features, "out_dimred", self.dtype)(x)
        return x


class MSResUNet(nn.Module):
    """Full RefineNet (ms_resunet.py:96-264)."""

    config: MSResUNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = self.dtype
        x = x.astype(dt)

        # --- stem: 5x5 s1 p1 (shrinks by 2), bn, relu
        x = nn.Conv(
            cfg.stem_channels,
            (5, 5),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=dt,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1"
        )(x)
        x = nn.relu(x)

        # --- encoder
        feats = []
        in_ch = cfg.stem_channels
        strides = (1, 2, 2, 2)
        for si, (planes, blocks, stride) in enumerate(
            zip(cfg.stage_planes, cfg.layers, strides)
        ):
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                x = Bottleneck(
                    planes, s, need_ds, dt, name=f"layer{si + 1}_{bi}"
                )(x, train=train)
                in_ch = planes * 4
            feats.append(x)
        l1, l2, l3, l4 = feats

        rc = cfg.refine_channels  # 128

        # --- refine stage 1 (deepest, from l4: 1024 -> 256)
        x4 = RefineStage(
            256,
            1024,
            adapt_blocks=2,
            mflow_blocks=3,
            has_adapt_dimred=False,
            has_out_dimred=True,
            out_features=rc,
            dtype=dt,
            name="refine1",
        )(l4)
        x4 = ConvTranspose2dTorch(rc, 4, 2, 1, dtype=dt, name="upCT4")(x4)
        x4 = _crop_like(x4, l3)

        # --- refine stage 2 (from l3: 512 -> 128, fused with x4)
        x3 = RefineStage(
            rc, 512, 2, 3, True, True, rc, dtype=dt, name="refine2"
        )(l3, x4)
        x3 = ConvTranspose2dTorch(rc, 4, 2, 1, dtype=dt, name="upCT3")(x3)
        x3 = _crop_like(x3, l2)

        # --- refine stage 3 (from l2: 256 -> 128, fused with x3)
        x2 = RefineStage(
            rc, 256, 2, 3, True, True, rc, dtype=dt, name="refine3"
        )(l2, x3)
        x2 = ConvTranspose2dTorch(rc, 4, 2, 1, dtype=dt, name="upCT2")(x2)
        x2 = _crop_like(x2, l1)

        # --- refine stage 4 (from l1: 128 -> 128, fused with x2, no out dimred)
        x1 = RefineStage(
            rc, 128, 2, 3, True, False, rc, dtype=dt, name="refine4"
        )(l1, x2)

        # --- head: 5x5 p2 then 3x3 p2 (grows by 2, undoing the stem shrink)
        out = nn.Conv(
            64, (5, 5), padding=((2, 2), (2, 2)), use_bias=True, dtype=dt, name="clf_conv1"
        )(x1)
        out = nn.Conv(
            cfg.out_channels,
            (3, 3),
            padding=((2, 2), (2, 2)),
            use_bias=True,
            dtype=dt,
            name="clf_conv2",
        )(out)
        return out


def build_msresunet(config: MSResUNetConfig, dtype=jnp.float32) -> MSResUNet:
    return MSResUNet(config=config, dtype=dtype)


register_model("ms_resunet", MSResUNetConfig, build_msresunet)

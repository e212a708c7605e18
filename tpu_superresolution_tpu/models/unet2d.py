"""UNet2D — the simple U-Net family of the reference's (lost) unet2d.py.

Capabilities reconstructed from notebooks/to_present/cnn.ipynb cells
31-34: ConvBNAct (Conv->BN->ReLU->Dropout), DoubleConv, Down
(MaxPool2 + DoubleConv), Up (bilinear upsample + 1x1-reduce conv, or
ConvTranspose; concat skip; DoubleConv), OutConv 1x1; config fields
(in_channels, out_channels, base_channels, depth, bilinear, norm,
dropout).  Canonical shape walk 64->1024->64 at depth 4 (cell 34).
`residual=True` adds the residual head variant tried in results.ipynb
cell 13.  Same-size restoration net (pre-upscale convention), NHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpu_superresolution_tpu.core.config import UNet2DConfig, register_model
from tpu_superresolution_tpu.ops.resize import resize_bilinear

Dtype = Any


class ConvBNAct(nn.Module):
    features: int
    norm: str = "batch"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=(self.norm == "none"),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DoubleConv(nn.Module):
    features: int
    norm: str = "batch"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.features, self.norm, self.dropout, self.dtype, name="c1")(x, train)
        x = ConvBNAct(self.features, self.norm, self.dropout, self.dtype, name="c2")(x, train)
        return x


class UNet2D(nn.Module):
    config: UNet2DConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = self.dtype
        inp = x = x.astype(dt)

        chans = [cfg.base_channels * (2**i) for i in range(cfg.depth + 1)]
        # encoder
        skips = []
        x = DoubleConv(chans[0], cfg.norm, cfg.dropout, dt, name="inc")(x, train)
        for i in range(cfg.depth):
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = DoubleConv(chans[i + 1], cfg.norm, cfg.dropout, dt, name=f"down{i + 1}")(x, train)
        # decoder
        for i in reversed(range(cfg.depth)):
            skip = skips[i]
            if cfg.bilinear:
                x = resize_bilinear(
                    x, x.shape[1] * 2, x.shape[2] * 2, antialias=False
                ).astype(dt)
                x = nn.Conv(
                    chans[i],
                    (1, 1),
                    dtype=dt,
                    name=f"up{cfg.depth - i}_reduce",
                )(x)
            else:
                x = nn.ConvTranspose(
                    chans[i], (2, 2), strides=(2, 2), dtype=dt, name=f"up{cfg.depth - i}_ct"
                )(x)
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(chans[i], cfg.norm, cfg.dropout, dt, name=f"up{cfg.depth - i}")(x, train)
        out = nn.Conv(cfg.out_channels, (1, 1), dtype=dt, name="outc")(x)
        if cfg.residual:
            out = out + inp[..., : cfg.out_channels]
        return out


def build_unet2d(config: UNet2DConfig, dtype=jnp.float32) -> UNet2D:
    return UNet2D(config=config, dtype=dtype)


register_model("unet2d", UNet2DConfig, build_unet2d)

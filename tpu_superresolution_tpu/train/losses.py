"""Loss functions (reference train.py:40-44 mse|l1 via --loss;
finetune_swinir.py:66-67 l1; cnn.ipynb cell 11 tried L1 + 0.1*(1-SSIM))."""

from __future__ import annotations

import jax.numpy as jnp

from tpu_superresolution_tpu.ops.metrics import ssim


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss(pred, target):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def l1_ssim_loss(pred, target, ssim_weight: float = 0.1):
    return l1_loss(pred, target) + ssim_weight * (
        1.0 - ssim(jnp.clip(pred, 0.0, 1.0), jnp.clip(target, 0.0, 1.0))
    )


_LOSSES = {"l1": l1_loss, "mse": mse_loss, "l1_ssim": l1_ssim_loss}


def get_loss(name: str):
    if name not in _LOSSES:
        raise ValueError(f"Unknown loss '{name}'. Options: {sorted(_LOSSES)}")
    return _LOSSES[name]

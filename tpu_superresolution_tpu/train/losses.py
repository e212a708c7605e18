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


def _per_image(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def l1_loss_per_sample(pred, target):
    return _per_image(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss_per_sample(pred, target):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return _per_image(d * d)


def l1_ssim_loss_per_sample(pred, target, ssim_weight: float = 0.1):
    s = ssim(
        jnp.clip(pred, 0.0, 1.0), jnp.clip(target, 0.0, 1.0), size_average=False
    )
    return l1_loss_per_sample(pred, target) + ssim_weight * (1.0 - s)


_LOSSES = {"l1": l1_loss, "mse": mse_loss, "l1_ssim": l1_ssim_loss}
_LOSSES_PER_SAMPLE = {
    "l1": l1_loss_per_sample,
    "mse": mse_loss_per_sample,
    "l1_ssim": l1_ssim_loss_per_sample,
}


def get_loss(name: str):
    if name not in _LOSSES:
        raise ValueError(f"Unknown loss '{name}'. Options: {sorted(_LOSSES)}")
    return _LOSSES[name]


def get_loss_per_sample(name: str):
    """Per-sample ([B]-shaped) loss — needed by the data-parallel step's
    weighted-mean formulation for padded ragged batches."""
    if name not in _LOSSES_PER_SAMPLE:
        raise ValueError(f"Unknown loss '{name}'. Options: {sorted(_LOSSES_PER_SAMPLE)}")
    return _LOSSES_PER_SAMPLE[name]

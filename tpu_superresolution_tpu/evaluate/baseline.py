"""Bicubic baseline: metrics of bicubic-upscaled LR vs HR.

The reference's floor-check fixture (evaluate.py:114-134): every trained
model must beat these numbers; published values in BASELINE.md (x2:
36.63 dB / 0.8748, x4: 31.42 dB / 0.7043 on DeepRockSR shuffled2D test).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpu_superresolution_tpu.data.transforms import pre_upscale_batch
from tpu_superresolution_tpu.ops.metrics import batch_psnr, ssim


@jax.jit
def _baseline_batch(lr_up, hr):
    p01 = jnp.clip(lr_up.astype(jnp.float32), 0.0, 1.0)
    t01 = jnp.clip(hr.astype(jnp.float32), 0.0, 1.0)
    return {
        "psnr_sum": batch_psnr(lr_up, hr).sum(),
        "ssim_sum": ssim(p01, t01) * lr_up.shape[0],
        "n": jnp.asarray(lr_up.shape[0], jnp.float32),
    }


def bicubic_baseline(loader, scale: int, pre_upscaled: bool = False) -> Dict[str, float]:
    """Iterate a loader of (lr, hr) numpy batches and accumulate
    baseline PSNR/SSIM.  `pre_upscaled`: LR already at HR size."""
    psnr_sum = ssim_sum = n = 0.0
    for lr_np, hr_np in loader:
        lr = jnp.asarray(lr_np)
        if not pre_upscaled:
            lr = pre_upscale_batch(lr, scale)
        m = _baseline_batch(lr, jnp.asarray(hr_np))
        psnr_sum += float(m["psnr_sum"])
        ssim_sum += float(m["ssim_sum"])
        n += float(m["n"])
    n = max(n, 1.0)
    return {"psnr": psnr_sum / n, "ssim": ssim_sum / n, "n": int(n)}

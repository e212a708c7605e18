"""PSNR / SSIM with exact reference semantics.

Two PSNR variants exist in the reference and they differ slightly:

- ``batch_psnr`` (modules/train.py:46-56, finetune_swinir.py:69-74):
  per-image, clamp to [0,1], ``20*log10(max/sqrt(mse+1e-8))`` → [B].
- ``psnr`` (modules/evaluate.py:24-29): batch-mean with
  ``mse.clamp(min=1e-10)`` then ``10*log10(1/mse)``.

SSIM replicates ``pytorch_msssim.ssim`` (the reference always calls it
with ``data_range=1.0`` and autocast disabled — modules/train.py:168-169,
modules/evaluate.py:194-195): gaussian window 11, sigma 1.5, *valid*
(un-padded) separable filtering, K=(0.01, 0.03), mean over everything.
All metrics compute in fp32.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def batch_psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR in dB, shape [B]; inputs NHWC (train-loop variant)."""
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    target = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    se = (pred - target) ** 2
    mse = se.reshape(se.shape[0], -1).mean(axis=1)
    return 20.0 * jnp.log10(max_val / jnp.sqrt(mse + 1e-8))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Batch-mean PSNR (evaluate.py variant): per-image MSE floored at 1e-10."""
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    target = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    se = (pred - target) ** 2
    mse = se.reshape(se.shape[0], -1).mean(axis=1)
    mse = jnp.maximum(mse, 1e-10)
    return (10.0 * jnp.log10((max_val * max_val) / mse)).mean()


@functools.lru_cache(maxsize=16)
def _gaussian_window(win_size: int, sigma: float) -> np.ndarray:
    """1D normalized gaussian, pytorch_msssim._fspecial_gauss_1d semantics.
    Kept as numpy: it's a trace-time constant folded into the band
    matrices (a jnp array here would become a tracer under jit)."""
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _gaussian_filter_valid(x: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian blur on NHWC (per-channel).

    pytorch_msssim runs a depthwise conv with padding=0 along H then W;
    formulated here as two einsum contractions against banded weight
    matrices so XLA lowers them to MXU GEMMs (win is tiny, the matrices
    are trace-time constants).
    """
    k = win.shape[0]
    h, w = x.shape[-3], x.shape[-2]

    def band(n):
        # [n-k+1, n] matrix: row i holds the window at offset i.
        m = np.zeros((n - k + 1, n), dtype=np.float32)
        wv = np.asarray(win)
        for i in range(n - k + 1):
            m[i, i : i + k] = wv
        return jnp.asarray(m)

    bh = band(h)
    bw = band(w)
    x = jnp.einsum("oh,...hwc->...owc", bh, x, precision="highest")
    x = jnp.einsum("ow,...hwc->...hoc", bw, x, precision="highest")
    return x


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM on NHWC images, pytorch_msssim parity.

    Returns a scalar (size_average=True) or per-image [B] values.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    win = _gaussian_window(win_size, win_sigma)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_filter_valid(x, win)
    mu2 = _gaussian_filter_valid(y, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = _gaussian_filter_valid(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter_valid(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter_valid(x * y, win) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    per_image = ssim_map.reshape(ssim_map.shape[0], -1).mean(axis=1)
    return per_image.mean() if size_average else per_image

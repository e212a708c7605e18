"""Antialiased separable resize with PIL/torchvision parity, as matmuls.

The reference's degradation-inversion convention bicubic-upscales LR to
the HR size with ``torchvision TF.resize(..., BICUBIC, antialias=True)``
(reference modules/sr_transforms.py:55-63), and its bicubic baseline is
the PSNR/SSIM of that upscale vs HR (modules/evaluate.py:114-134) — so
metric parity (≤0.05 dB) requires reproducing PIL's antialiased kernel
semantics, not `jax.image.resize` (different weighting near borders).

TPU-first design: a separable resize is two dense matmuls
``out = W_h @ img @ W_w^T``.  The weight matrices depend only on the
static (in_size, out_size) pair, are computed once on host in float64,
and become jit-time constants — the resize itself runs on the MXU as two
batched GEMMs instead of gathers, which is the speed-of-light
formulation for this op on TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel, a=-0.5 (PIL / torchvision / OpenCV convention)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.clip(1.0 - x, 0.0, None)


_KERNELS = {
    "bicubic": (_cubic_kernel, 2.0),
    "bilinear": (_linear_kernel, 1.0),
}


@functools.lru_cache(maxsize=512)
def _resize_matrix(in_size: int, out_size: int, method: str, antialias: bool):
    """[out_size, in_size] row-stochastic weight matrix, PIL semantics.

    Mirrors PIL's ImagingResampleHorizontal weight computation: centers at
    (i+0.5)*scale, support scaled by the downscale factor when
    antialiasing, edge clamping by re-normalizing over in-range taps.
    """
    kernel, base_support = _KERNELS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0) if antialias else 1.0
    support = base_support * filterscale

    W = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        w = kernel((js - center + 0.5) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        W[i, xmin:xmax] = w
    # numpy, not jnp: this is lru_cached, and a jnp array created inside
    # a jit trace would be cached as a tracer and escape the trace.
    return W.astype(np.float32)


def _apply_separable(img: jnp.ndarray, wh: jnp.ndarray, ww: jnp.ndarray) -> jnp.ndarray:
    """img [..., H, W, C] -> [..., H', W', C] via two contractions."""
    # Height: contract H against wh [H', H].
    out = jnp.einsum("oh,...hwc->...owc", wh, img, precision="highest")
    # Width: contract W against ww [W', W].
    out = jnp.einsum("ow,...hwc->...hoc", ww, out, precision="highest")
    return out


def resize(
    img: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "bicubic",
    antialias: bool = True,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) image(s) to (out_h, out_w), PIL-parity.

    Runs in fp32 regardless of input dtype (metric-bearing op); callers
    cast back as needed.
    """
    if img.ndim < 3:
        raise ValueError(f"expected [..., H, W, C], got shape {img.shape}")
    in_h, in_w = img.shape[-3], img.shape[-2]
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    if (in_h, in_w) != (out_h, out_w):
        wh = _resize_matrix(in_h, out_h, method, antialias)
        ww = _resize_matrix(in_w, out_w, method, antialias)
        x = _apply_separable(x, wh, ww)
    if jnp.issubdtype(orig_dtype, jnp.floating) and orig_dtype != jnp.float32:
        x = x.astype(orig_dtype)
    return x


def resize_bicubic(img, out_h, out_w, antialias: bool = True):
    return resize(img, out_h, out_w, "bicubic", antialias)


def resize_bilinear(img, out_h, out_w, antialias: bool = True):
    return resize(img, out_h, out_w, "bilinear", antialias)


def upscale_lr_to_hr(lr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """PairUpscaleLRtoHR equivalent (reference sr_transforms.py:55-63):
    bicubic+antialias upscale of LR by `scale` (antialias is a no-op when
    upscaling but kept for exact torchvision semantics)."""
    h, w = lr.shape[-3], lr.shape[-2]
    return resize_bicubic(lr, h * scale, w * scale, antialias=True)


def degrade_hr_to_lr(hr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """On-device bicubic downscale (antialiased) producing LR from HR —
    the DeepRockSR 'default' degradation used to build LR_default_X{2,4}."""
    h, w = hr.shape[-3], hr.shape[-2]
    return resize_bicubic(hr, h // scale, w // scale, antialias=True)

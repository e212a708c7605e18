"""Depth-to-space / space-to-depth for NHWC with torch channel ordering.

``torch.nn.PixelShuffle(r)`` maps channel index ``c*r*r + i*r + j`` of the
input to spatial offset (i, j) of output channel c.  All reference
upsamplers rely on it (network_swinir.py:572-615, hat_arch.py:688-707,
dat_arch.py:655-696), and weight conversion from torch checkpoints needs
the exact same channel ordering, so we keep it (C-major) here in NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C] (torch ordering)."""
    b, h, w, crr = x.shape
    if crr % (r * r) != 0:
        raise ValueError(f"channels {crr} not divisible by r^2={r*r}")
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H*r, W*r, C] -> [B, H, W, C*r*r] (inverse of pixel_shuffle)."""
    b, hr, wr, c = x.shape
    if hr % r or wr % r:
        raise ValueError(f"spatial {hr}x{wr} not divisible by r={r}")
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h, w, c * r * r)

"""On-device paired transforms — batched, jit'd, `jax.random`-keyed.

The TPU-native replacement for the reference's per-sample host
transforms (sr_transforms.py + finetune_swinir.py:96-131): whole batches
are cropped/flipped/resized as one XLA program.  Two conventions:

- **pre_upscale** (CNN path, sr_transforms.py:136-152): LR is bicubic-
  upscaled to HR size first, then a shared random crop + flips.
- **native_lr** (transformer path, finetune_swinir.py:96-110): crop
  lr_patch from LR at (top, left) and lr_patch*s from HR at scaled
  coordinates; model upsamples internally.

Randomness uses jax.random keys (replacing torch.rand coin flips,
sr_transforms.py:101-102,119-122); per-image independent crops/flips via
vmap.  All shapes static: crop via lax.dynamic_slice with traced offsets.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_superresolution_tpu.ops.resize import resize_bicubic


def pre_upscale_batch(lr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic+antialias upscale LR [B,h,w,C] to [B,h*s,w*s,C]
    (PairUpscaleLRtoHR, sr_transforms.py:55-63)."""
    return resize_bicubic(lr, lr.shape[1] * scale, lr.shape[2] * scale)


def _crop_one(img, top, left, ph, pw):
    return jax.lax.dynamic_slice(
        img, (top, left, 0), (ph, pw, img.shape[-1])
    )


def paired_random_crop(
    lr: jnp.ndarray, hr: jnp.ndarray, patch: int, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same-coordinates random crop for equal-size pairs
    (PairRandomCrop, sr_transforms.py:65-112).  Per-image offsets.
    If patch >= image, center-crops to min size (static decision)."""
    b, h, w, _ = hr.shape
    ph, pw = min(patch, h), min(patch, w)
    if ph == h and pw == w:
        return lr, hr
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (b,), 0, h - ph + 1)
    lefts = jax.random.randint(kl, (b,), 0, w - pw + 1)
    crop = jax.vmap(functools.partial(_crop_one, ph=ph, pw=pw))
    return crop(lr, tops, lefts), crop(hr, tops, lefts)


def paired_random_crop_native(
    lr: jnp.ndarray, hr: jnp.ndarray, lr_patch: int, scale: int, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale-aware crop (finetune_swinir.py:96-110): LR crop at (t, l) of
    size p; HR crop at (t*s, l*s) of size p*s."""
    b, h, w, _ = lr.shape
    if h < lr_patch or w < lr_patch:
        raise ValueError(f"LR {h}x{w} smaller than lr_patch {lr_patch}")
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (b,), 0, h - lr_patch + 1)
    lefts = jax.random.randint(kl, (b,), 0, w - lr_patch + 1)
    lr_c = jax.vmap(functools.partial(_crop_one, ph=lr_patch, pw=lr_patch))(
        lr, tops, lefts
    )
    hr_c = jax.vmap(
        functools.partial(_crop_one, ph=lr_patch * scale, pw=lr_patch * scale)
    )(hr, tops * scale, lefts * scale)
    return lr_c, hr_c


def paired_random_flips(
    lr: jnp.ndarray, hr: jnp.ndarray, key: jax.Array, p_h: float = 0.5, p_v: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coin-flip h/v flips applied identically to the pair, per image
    (PairFlips, sr_transforms.py:114-123)."""
    b = lr.shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, p_h, (b, 1, 1, 1))
    do_v = jax.random.bernoulli(kv, p_v, (b, 1, 1, 1))

    def flip(x):
        x = jnp.where(do_h, x[:, :, ::-1, :], x)  # hflip = reverse W
        x = jnp.where(do_v, x[:, ::-1, :, :], x)  # vflip = reverse H
        return x

    return flip(lr), flip(hr)


@functools.partial(
    jax.jit, static_argnames=("scale", "patch", "do_flips", "do_blur")
)
def make_train_batch_preupscale(
    lr: jnp.ndarray,
    hr: jnp.ndarray,
    key: jax.Array,
    scale: int,
    patch: int,
    do_flips: bool = True,
    do_blur: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused on-device train-batch pipeline, pre-upscale convention:
    upscale LR to HR size -> shared random crop -> flips [-> blur]
    (blur = the notebook pipeline's PairGaussianBlur, cnn.ipynb cell 22)."""
    lr_up = pre_upscale_batch(lr, scale)
    kc, kf, kb = jax.random.split(key, 3)
    lr_c, hr_c = paired_random_crop(lr_up, hr, patch, kc)
    if do_flips:
        lr_c, hr_c = paired_random_flips(lr_c, hr_c, kf)
    if do_blur:
        lr_c, hr_c = paired_random_blur(lr_c, hr_c, kb)
    return lr_c, hr_c


@functools.partial(
    jax.jit, static_argnames=("scale", "lr_patch", "do_flips", "do_blur")
)
def make_train_batch_native(
    lr: jnp.ndarray,
    hr: jnp.ndarray,
    key: jax.Array,
    scale: int,
    lr_patch: int,
    do_flips: bool = False,
    do_blur: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused pipeline, native-LR convention (SwinIR finetune path —
    reference uses crop only, no flips: finetune_swinir.py:112-121)."""
    kc, kf, kb = jax.random.split(key, 3)
    lr_c, hr_c = paired_random_crop_native(lr, hr, lr_patch, scale, kc)
    if do_flips:
        lr_c, hr_c = paired_random_flips(lr_c, hr_c, kf)
    if do_blur:
        lr_c, hr_c = paired_random_blur(lr_c, hr_c, kb)
    return lr_c, hr_c


def make_eval_batch_preupscale(lr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Eval pipeline (build_pair_transform_eval, sr_transforms.py:154-162):
    full-image bicubic pre-upscale, no aug."""
    return pre_upscale_batch(lr, scale)


# ---------------------------------------------------------------------------
# Extended augmentation (reference notebook pipeline, cnn.ipynb cell 22:
# PairGaussianBlur with a shared sigma per pair at p=0.5, PairNormalize
# with dataset stats; stats pass in cell 17)
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(sigma, radius: int):
    """Traced 1-D gaussian of static radius (sigma may be a traced value)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def gaussian_blur(x: jnp.ndarray, sigma, radius: int = 4) -> jnp.ndarray:
    """Separable gaussian blur on [B, H, W, C] with reflect padding
    (torchvision GaussianBlur semantics).  `sigma` may be traced (drawn
    from jax.random); the kernel RADIUS is static."""
    k = _gaussian_kernel1d(sigma, radius)
    xp = jnp.pad(x, ((0, 0), (radius, radius), (0, 0), (0, 0)), mode="reflect")
    kh = k.reshape(-1, 1, 1, 1).astype(x.dtype)  # [K,1,1,1] depthwise over H
    c = x.shape[-1]
    xh = jax.lax.conv_general_dilated(
        xp, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    xp = jnp.pad(xh, ((0, 0), (0, 0), (radius, radius), (0, 0)), mode="reflect")
    kw = k.reshape(1, -1, 1, 1).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        xp, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def paired_random_blur(
    lr: jnp.ndarray,
    hr: jnp.ndarray,
    key: jax.Array,
    p: float = 0.5,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PairGaussianBlur (cnn.ipynb cell 22): one shared sigma per pair,
    applied to BOTH with probability p.  Per-image decisions."""
    b = lr.shape[0]
    kp, ks = jax.random.split(key)
    do = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
    sigma = jax.random.uniform(
        ks, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    lr_b = gaussian_blur(lr, sigma)
    hr_b = gaussian_blur(hr, sigma)
    return jnp.where(do, lr_b, lr), jnp.where(do, hr_b, hr)


def normalize(x: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """PairNormalize (cnn.ipynb cell 22): (x - mean) / std."""
    return (x - mean) / std


def denormalize(x: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    return x * std + mean


def dataset_mean_std(loader, use_hr: bool = True) -> Tuple[float, float]:
    """Streaming dataset mean/std (the reference's hist-based
    mean_std_via_hist_from_ds, cnn.ipynb cell 17 — exact moments here;
    the published HR stats were mean=0.45161797 std=0.20893379, cell 20)."""
    import numpy as np

    s = ss = n = 0.0
    for lr_np, hr_np in loader:
        x = hr_np if use_hr else lr_np
        s += float(x.sum())
        ss += float((x.astype(np.float64) ** 2).sum())
        n += x.size
    mean = s / max(n, 1.0)
    var = ss / max(n, 1.0) - mean * mean
    return mean, float(np.sqrt(max(var, 0.0)))

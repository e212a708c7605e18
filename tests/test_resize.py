"""Bicubic/bilinear resize parity vs PIL.

The reference uses torchvision TF.resize(..., BICUBIC, antialias=True)
(sr_transforms.py:55-63) whose antialiased kernels match PIL exactly —
so PIL is the golden reference here.  Budget: the SURVEY (§7 hard part
#2) requires ~1e-3 parity for the ≤0.05 dB PSNR budget.
"""

import numpy as np
import pytest
from PIL import Image

from tpu_superresolution_tpu.ops.resize import (
    degrade_hr_to_lr,
    resize_bicubic,
    resize_bilinear,
    upscale_lr_to_hr,
)


def _pil_resize(arr01, out_w, out_h, method):
    """arr01: [H, W] float in [0,1] -> PIL resize in float mode."""
    im = Image.fromarray(arr01.astype(np.float32), mode="F")
    resample = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR}[method]
    out = im.resize((out_w, out_h), resample=resample)
    return np.asarray(out, dtype=np.float32)


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((64, 64), (128, 128)),  # x2 up
        ((50, 70), (200, 280)),  # x4 up, non-square
        ((128, 128), (64, 64)),  # x2 down (antialias path)
        ((200, 120), (50, 30)),  # x4 down
        ((37, 53), (91, 113)),  # odd fractional
    ],
)
def test_resize_matches_pil(method, in_hw, out_hw, rng):
    h, w = in_hw
    oh, ow = out_hw
    img = rng.random((h, w), dtype=np.float32)
    ours = np.asarray(
        resize_bicubic(img[..., None], oh, ow)
        if method == "bicubic"
        else resize_bilinear(img[..., None], oh, ow)
    )[..., 0]
    ref = _pil_resize(img, ow, oh, method)
    assert np.max(np.abs(ours - ref)) < 2e-5, (
        f"max abs diff {np.max(np.abs(ours - ref)):.3e}"
    )


def test_upscale_lr_to_hr_shapes(rng):
    lr = rng.random((2, 50, 60, 1), dtype=np.float32)
    hr2 = upscale_lr_to_hr(lr, 2)
    assert hr2.shape == (2, 100, 120, 1)
    hr4 = upscale_lr_to_hr(lr, 4)
    assert hr4.shape == (2, 200, 240, 1)


def test_degrade_then_upscale_roundtrip_close(rng):
    # Smooth image: degrade x2 then upscale x2 should be close.
    x = np.linspace(0, 1, 64, dtype=np.float32)
    img = (x[:, None] * x[None, :])[None, ..., None]
    lr = degrade_hr_to_lr(img, 2)
    rec = np.asarray(upscale_lr_to_hr(lr, 2))
    assert np.mean(np.abs(rec - img)) < 5e-3


def test_identity_resize_is_noop(rng):
    img = rng.random((3, 32, 32, 2), dtype=np.float32)
    out = np.asarray(resize_bicubic(img, 32, 32))
    np.testing.assert_array_equal(out, img)


def test_batch_and_channels_consistent(rng):
    """Batched multichannel resize == per-image per-channel resize."""
    img = rng.random((2, 40, 40, 3), dtype=np.float32)
    out = np.asarray(resize_bicubic(img, 80, 80))
    for b in range(2):
        for c in range(3):
            single = np.asarray(
                resize_bicubic(img[b, :, :, c : c + 1], 80, 80)
            )[..., 0]
            np.testing.assert_allclose(out[b, :, :, c], single, rtol=0, atol=1e-6)

"""PSNR/SSIM parity tests.

PSNR is checked against torch implementations of the reference's exact
formulas (train.py:46-56, evaluate.py:24-29).  SSIM is checked against a
torch reimplementation of pytorch_msssim's algorithm (gaussian 1D window
11/1.5, separable depthwise conv with padding=0, K=(0.01,0.03)) — the
package itself is not installed in this image, but its semantics are
fixed and small enough to restate exactly here.
"""

import numpy as np
import torch
import torch.nn.functional as F

from tpu_superresolution_tpu.ops.metrics import batch_psnr, psnr, ssim


def _torch_batch_psnr(pred, target, max_val=1.0):
    pred = pred.clamp(0.0, 1.0)
    target = target.clamp(0.0, 1.0)
    mse = F.mse_loss(pred, target, reduction="none")
    mse = mse.view(mse.size(0), -1).mean(dim=1)
    return 20.0 * torch.log10(max_val / torch.sqrt(mse + 1e-8))


def _torch_eval_psnr(pred, target):
    pred = pred.clamp(0, 1)
    target = target.clamp(0, 1)
    mse = ((pred - target) ** 2).flatten(1).mean(1).clamp(min=1e-10)
    return (10.0 * torch.log10(1.0 / mse)).mean()


def _fspecial_gauss_1d(size, sigma):
    coords = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return g.to(torch.float32).reshape(1, 1, size)


def _gaussian_filter(x, win):
    # pytorch_msssim.gaussian_filter: separable conv, groups=C, padding 0
    c = x.shape[1]
    out = F.conv2d(x, win.unsqueeze(2).expand(c, 1, 1, -1), groups=c)
    out = F.conv2d(out, win.unsqueeze(3).expand(c, 1, -1, 1), groups=c)
    return out


def _torch_ssim(x, y, data_range=1.0, size_average=True):
    win = _fspecial_gauss_1d(11, 1.5)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1, mu2 = _gaussian_filter(x, win), _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    per_image = ssim_map.flatten(1).mean(1)
    return per_image.mean() if size_average else per_image


def _pair(rng, b=3, c=1, h=48, w=56, noise=0.05):
    target = rng.random((b, h, w, c), dtype=np.float32)
    pred = np.clip(target + noise * rng.standard_normal((b, h, w, c)).astype(np.float32), 0, 1)
    return pred, target


def _to_torch(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_batch_psnr_matches_reference_formula(rng):
    pred, target = _pair(rng)
    ours = np.asarray(batch_psnr(pred, target))
    ref = _torch_batch_psnr(_to_torch(pred), _to_torch(target)).numpy()
    # fp32 reduction-order noise only
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_eval_psnr_matches_reference_formula(rng):
    pred, target = _pair(rng, b=4, c=1, h=64, w=64)
    ours = float(psnr(pred, target))
    ref = float(_torch_eval_psnr(_to_torch(pred), _to_torch(target)))
    assert abs(ours - ref) < 1e-3  # fp32 reduction-order noise


def test_psnr_identical_images_is_high(rng):
    x = rng.random((2, 32, 32, 1), dtype=np.float32)
    assert float(psnr(x, x)) > 95.0  # floored at 1e-10 mse -> 100 dB
    assert np.all(np.asarray(batch_psnr(x, x)) > 75.0)  # eps 1e-8 -> 80 dB


def test_ssim_matches_pytorch_msssim_semantics(rng):
    for c in (1, 3):
        pred, target = _pair(rng, b=2, c=c, h=64, w=72, noise=0.08)
        ours = float(ssim(pred, target, data_range=1.0))
        ref = float(_torch_ssim(_to_torch(pred), _to_torch(target)))
        assert abs(ours - ref) < 2e-6, f"c={c}: {ours} vs {ref}"


def test_ssim_per_image(rng):
    pred, target = _pair(rng, b=3)
    ours = np.asarray(ssim(pred, target, size_average=False))
    ref = _torch_ssim(_to_torch(pred), _to_torch(target), size_average=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)
    assert ours.shape == (3,)


def test_ssim_identical_is_one(rng):
    x = rng.random((1, 32, 32, 1), dtype=np.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6

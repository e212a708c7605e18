"""Extended augmentation (cnn.ipynb notebook pipeline) + MRCCM .mat
pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_superresolution_tpu.data.transforms import (
    dataset_mean_std,
    denormalize,
    gaussian_blur,
    normalize,
    paired_random_blur,
)


def test_gaussian_blur_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter1d

    x = rng.random((1, 32, 32, 1), dtype=np.float32)
    sigma = 1.3
    ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma, radius=4))[0, :, :, 0]
    # jnp/torch 'reflect' (edge-excluding) == scipy 'mirror'
    ref = gaussian_filter1d(
        gaussian_filter1d(x[0, :, :, 0], sigma, axis=0, mode="mirror", radius=4),
        sigma, axis=1, mode="mirror", radius=4,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_paired_blur_shared_and_random(rng):
    lr = jnp.asarray(rng.random((8, 16, 16, 1), dtype=np.float32))
    hr = lr
    lb, hb = paired_random_blur(lr, hr, jax.random.key(1), p=0.5)
    # pair stays identical (same sigma both sides)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(hb), atol=1e-7)
    # with p=0.5 over 8 images, some blurred and some not
    changed = [
        not np.allclose(np.asarray(lb[i]), np.asarray(lr[i])) for i in range(8)
    ]
    assert any(changed) and not all(changed)


def test_normalize_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    y = normalize(x, 0.4516, 0.2089)
    np.testing.assert_allclose(
        np.asarray(denormalize(y, 0.4516, 0.2089)), np.asarray(x), atol=1e-6
    )


def test_dataset_mean_std(rng):
    batches = [
        (None, rng.random((4, 8, 8, 1), dtype=np.float32)) for _ in range(5)
    ]
    mean, std = dataset_mean_std(batches)
    allpix = np.concatenate([b[1].ravel() for b in batches])
    assert abs(mean - allpix.mean()) < 1e-6
    assert abs(std - allpix.std()) < 1e-5


# ---------------------------------------------------------------------------
# MRCCM
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mat_files(tmp_path_factory):
    from scipy.io import savemat

    root = tmp_path_factory.mktemp("mats")
    rng = np.random.default_rng(0)
    hr = (rng.random((12, 64, 64)) * 1000).astype(np.float32)
    lr = hr[:, ::4, ::4].copy()
    savemat(root / "hr1.mat", {"vol": hr})
    savemat(root / "lr.mat", {"vol": lr})
    return root


def test_load_and_normalize(mat_files):
    from tpu_superresolution_tpu.data.mrccm import load_mat_volume, normalize_volume

    vol = load_mat_volume(mat_files / "hr1.mat")
    assert vol.shape == (12, 64, 64)
    n = normalize_volume(vol)
    assert 0.0 <= n.min() and n.max() <= 1.0 and n.max() > 0.9


def test_prepare_mrccm_layout(mat_files, tmp_path):
    from tpu_superresolution_tpu.data import Loader, PairedIndex
    from tpu_superresolution_tpu.data.mrccm import prepare_mrccm

    counts = prepare_mrccm(
        mat_files / "lr.mat", {"hr1": str(mat_files / "hr1.mat")},
        tmp_path / "MRCCM2D", scale="X4", force_4x=True,
    )
    assert counts == {"train": 10, "valid": 1, "test": 1}
    idx = PairedIndex(str(tmp_path / "MRCCM2D"), "train", "X4")
    lr_np, hr_np = next(iter(Loader(idx, 2, use_native="never")))
    assert lr_np.shape == (2, 16, 16, 1) and hr_np.shape == (2, 64, 64, 1)
    # 16-bit PNG decode preserved precision
    assert lr_np.max() <= 1.0 and hr_np.max() > 0.5


def test_mat_volume_pairs_limit(mat_files):
    from tpu_superresolution_tpu.data.mrccm import mat_volume_pairs

    lr, hr = mat_volume_pairs(mat_files / "lr.mat", mat_files / "hr1.mat", 5)
    assert lr.shape == (5, 16, 16, 1) and hr.shape == (5, 64, 64, 1)


def test_prepare_then_mat_eval_cli(mat_files, tmp_path, capsys):
    """prepare_mrccm CLI -> train a tiny model -> mat_eval CLI."""
    from tpu_superresolution_tpu.cli.prepare_mrccm import main as prep_main
    from tpu_superresolution_tpu.cli.train import main as train_main
    from tpu_superresolution_tpu.cli.mat_eval import main as mat_eval_main

    prep_main([
        "--lr_mat", str(mat_files / "lr.mat"),
        "--hr", f"hr1={mat_files / 'hr1.mat'}",
        "--out_root", str(tmp_path / "M2D"), "--scale", "X4", "--force_4x",
    ])
    out = capsys.readouterr().out
    assert "[done] wrote" in out

    train_main([
        "--data_root", str(tmp_path / "M2D"), "--scale", "X4",
        "--model", "unet2d", "--base_channels", "4", "--depth", "1",
        "--epochs", "1", "--batch_size", "4", "--patch_size", "32",
        "--workdir", str(tmp_path),
    ])
    capsys.readouterr()

    results = mat_eval_main([
        "--hr_mat", str(mat_files / "hr1.mat"),
        "--lr_mat", str(mat_files / "lr.mat"),
        "--ckpt", str(tmp_path / "best_X4"),
        "--batch_size", "4", "--limit_pairs", "6", "--scale", "X4",
    ])
    out = capsys.readouterr().out
    assert "[baseline] Bicubic PSNR" in out and "[result] PSNR" in out
    assert results["n"] == 6

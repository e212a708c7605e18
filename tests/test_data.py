"""Data layer tests: index pairing, decode, on-device transforms, loader."""

from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.util_fakedata import make_deeprock_dataset

from tpu_superresolution_tpu.data import (
    Loader,
    PairedIndex,
    load_pair_batch,
    strip_lr_suffix,
)
from tpu_superresolution_tpu.data.transforms import (
    make_train_batch_native,
    make_train_batch_preupscale,
    paired_random_crop,
    paired_random_crop_native,
    paired_random_flips,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("deeprock")
    make_deeprock_dataset(root, hr_size=64, scale="X2")
    make_deeprock_dataset(root, hr_size=64, scale="X4")
    return root


def test_strip_lr_suffix_variants():
    # reference regex (sr_datasets.py:24-29): x2 / _x2 / -x2, case-insensitive
    assert strip_lr_suffix("img001x2", "X2") == "img001"
    assert strip_lr_suffix("img001_x2", "X2") == "img001"
    assert strip_lr_suffix("img001-X2", "X2") == "img001"
    assert strip_lr_suffix("img001x4", "X4") == "img001"
    assert strip_lr_suffix("img001", "X2") == "img001"
    assert strip_lr_suffix("x2img", "X2") == "x2img"  # only trailing


def test_index_pairs(dataset):
    idx = PairedIndex(str(dataset), split="train", scale="X2")
    assert len(idx) == 6
    lr_path, hr_path = idx[0]
    assert "LR_default_X2" in str(lr_path)
    assert strip_lr_suffix(lr_path.stem, "X2") == hr_path.stem


def test_index_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        PairedIndex(str(tmp_path), split="train", scale="X2")


def test_decode_batch(dataset):
    idx = PairedIndex(str(dataset), split="train", scale="X2")
    lr, hr = load_pair_batch([idx[0], idx[1]])
    assert lr.shape == (2, 32, 32, 1) and hr.shape == (2, 64, 64, 1)
    assert lr.dtype == np.float32
    assert 0.0 <= lr.min() and lr.max() <= 1.0


def test_decode_3ch(dataset):
    idx = PairedIndex(str(dataset), split="train", scale="X2")
    lr, hr = load_pair_batch([idx[0]], grayscale=False, channels=3)
    assert lr.shape[-1] == 3 and hr.shape[-1] == 3
    # replicated channels
    np.testing.assert_array_equal(lr[..., 0], lr[..., 1])


def test_paired_random_crop_same_window(rng):
    hr = jnp.asarray(rng.random((3, 40, 40, 1), dtype=np.float32))
    lr = hr * 0.5
    lc, hc = paired_random_crop(lr, hr, 16, jax.random.key(0))
    assert lc.shape == (3, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(hc) * 0.5, rtol=1e-6)


def test_paired_random_crop_patch_larger_than_image(rng):
    hr = jnp.asarray(rng.random((2, 20, 20, 1), dtype=np.float32))
    lc, hc = paired_random_crop(hr, hr, 32, jax.random.key(0))
    assert hc.shape == (2, 20, 20, 1)  # center/full fallback


def test_native_crop_scale_alignment(rng):
    """HR crop must be the scaled window of the LR crop."""
    s = 2
    hr = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
    lr = hr[:, ::s, ::s, :]  # trivially aligned "LR"
    lc, hc = paired_random_crop_native(lr, hr, 8, s, jax.random.key(1))
    assert lc.shape == (2, 8, 8, 1) and hc.shape == (2, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(lc), np.asarray(hc[:, ::s, ::s, :]), rtol=1e-6
    )


def test_flips_paired_and_random(rng):
    lr = jnp.asarray(rng.random((8, 8, 8, 1), dtype=np.float32))
    hr = lr + 1.0
    lf, hf = paired_random_flips(lr, hr, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(hf) - np.asarray(lf), 1.0, rtol=1e-5)
    # with 8 images, essentially impossible all unflipped
    assert not np.allclose(np.asarray(lf), np.asarray(lr))


def test_fused_batch_determinism(rng):
    lr = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    hr = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
    k = jax.random.key(7)
    a1, b1 = make_train_batch_preupscale(lr, hr, k, 2, 24, True)
    a2, b2 = make_train_batch_preupscale(lr, hr, k, 2, 24, True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert a1.shape == (2, 24, 24, 1)
    a3, _ = make_train_batch_native(lr, hr, k, 2, 16, False)
    assert a3.shape == (2, 16, 16, 1)


def test_loader_epochs_and_shuffle(dataset):
    idx = PairedIndex(str(dataset), split="train", scale="X2")
    loader = Loader(idx, batch_size=4, shuffle=True, seed=1)
    assert len(loader) == 2  # 6 imgs, bs 4 -> 2 batches
    b1 = [lr for lr, hr in loader]
    assert b1[0].shape == (4, 32, 32, 1) and b1[1].shape == (2, 32, 32, 1)
    loader2 = Loader(idx, batch_size=4, shuffle=True, seed=1)
    b2 = [lr for lr, hr in loader2]
    np.testing.assert_array_equal(b1[0], b2[0])  # same seed+epoch => same order


def test_loader_drop_last(dataset):
    idx = PairedIndex(str(dataset), split="train", scale="X2")
    loader = Loader(idx, batch_size=4, drop_last=True)
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1


def test_loader_host_crop(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    loader = Loader(idx, 4, host_crop_hr=32, host_crop_scale=2, seed=5)
    lr, hr = next(iter(loader))
    assert lr.shape == (4, 16, 16, 1) and hr.shape == (4, 32, 32, 1)
    # alignment: LR crop must equal the scale-decimated HR window when the
    # LR was built by exact decimation... our fake LR is bicubic, so just
    # verify determinism + variation instead
    loader2 = Loader(idx, 4, host_crop_hr=32, host_crop_scale=2, seed=5)
    lr2, hr2 = next(iter(loader2))
    np.testing.assert_array_equal(lr, lr2)
    np.testing.assert_array_equal(hr, hr2)
    # second epoch gives different crops
    lr3, hr3 = next(iter(loader))
    assert not np.array_equal(hr, hr3)


def test_loader_host_crop_noop_when_small(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    loader = Loader(idx, 2, host_crop_hr=128, host_crop_scale=2)
    lr, hr = next(iter(loader))
    assert hr.shape == (2, 64, 64, 1)  # image smaller than crop -> untouched


def test_loader_host_crop_alignment():
    """With an exactly-decimated LR, host crops must stay pixel-aligned."""
    import tempfile
    from PIL import Image

    tmp = tempfile.mkdtemp()
    rng_ = np.random.default_rng(3)
    hr_dir = Path(tmp) / "shuffled2D" / "shuffled2D_train_HR"
    lr_dir = Path(tmp) / "shuffled2D" / "shuffled2D_train_LR_default_X2"
    hr_dir.mkdir(parents=True); lr_dir.mkdir(parents=True)
    for i in range(3):
        hr_img = (rng_.random((40, 40)) * 255).astype(np.uint8)
        Image.fromarray(hr_img, "L").save(hr_dir / f"i{i}.png")
        Image.fromarray(hr_img[::2, ::2], "L").save(lr_dir / f"i{i}x2.png")
    idx = PairedIndex(tmp, "train", "X2")
    loader = Loader(idx, 3, host_crop_hr=16, host_crop_scale=2, use_native="never")
    lr, hr = next(iter(loader))
    np.testing.assert_array_equal(lr[..., 0], hr[:, ::2, ::2, 0])


def test_loader_decode_cache(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    loader = Loader(idx, 3, cache_decoded=True, use_native="never")
    b1 = [(lr.copy(), hr.copy()) for lr, hr in loader]
    assert loader._cache_bytes > 0 and len(loader._cache) == 6
    b2 = list(loader)  # second epoch from cache
    for (lr1, hr1), (lr2, hr2) in zip(b1, b2):
        # uint16 round-trip: tolerance 1/65535
        np.testing.assert_allclose(lr1, lr2, atol=1.1 / 65535)
        np.testing.assert_allclose(hr1, hr2, atol=1.1 / 65535)


def test_loader_cache_limit(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    loader = Loader(idx, 3, cache_decoded=True, cache_limit_gb=1e-6, use_native="never")
    b = list(loader)  # nothing fits; must still yield correct shapes
    assert b[0][1].shape == (3, 64, 64, 1)
    assert len(loader._cache) == 0

"""Native C++ PNG decoder: parity with the PIL path + loader integration."""

import numpy as np
import pytest
from PIL import Image

from tests.util_fakedata import make_deeprock_dataset

from tpu_superresolution_tpu.data import Loader, PairedIndex, load_pair_batch
from tpu_superresolution_tpu.data import native_decode


pytestmark = pytest.mark.skipif(
    not native_decode.available(), reason="native decoder not built"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("deeprock_native")
    make_deeprock_dataset(root, hr_size=64, scale="X2", n_per_split=6)
    return root


def test_probe(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    h, w, c, b = native_decode.probe(idx[0][1])
    assert (h, w, c, b) == (64, 64, 1, 8)


def test_native_matches_pil_gray(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    pairs = [idx[i] for i in range(4)]
    lr_pil, hr_pil = load_pair_batch(pairs, grayscale=True, channels=1)
    lr_nat = native_decode.decode_batch_native([p[0] for p in pairs], 32, 32)
    hr_nat = native_decode.decode_batch_native([p[1] for p in pairs], 64, 64)
    np.testing.assert_allclose(lr_nat, lr_pil, atol=1e-6)
    np.testing.assert_allclose(hr_nat, hr_pil, atol=1e-6)


def test_native_matches_pil_3ch(dataset):
    idx = PairedIndex(str(dataset), "train", "X2")
    pairs = [idx[0]]
    _, hr_pil = load_pair_batch(pairs, grayscale=False, channels=3)
    hr_nat = native_decode.decode_batch_native(
        [pairs[0][1]], 64, 64, grayscale=False, channels=3
    )
    np.testing.assert_allclose(hr_nat, hr_pil, atol=1e-6)


def test_native_rgb_and_16bit(tmp_path):
    rng = np.random.default_rng(0)
    # RGB 8-bit
    rgb = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
    p_rgb = tmp_path / "rgb.png"
    Image.fromarray(rgb, "RGB").save(p_rgb)
    nat = native_decode.decode_batch_native([p_rgb], 20, 24, grayscale=False, channels=3)
    np.testing.assert_allclose(nat[0], rgb.astype(np.float32) / 255.0, atol=1e-6)
    # RGB -> gray luma
    nat_g = native_decode.decode_batch_native([p_rgb], 20, 24, grayscale=True, channels=1)
    luma = rgb.astype(np.float32) / 255.0 @ np.asarray([0.2989, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(nat_g[0, :, :, 0], luma, atol=2e-6)
    # 16-bit grayscale
    g16 = (rng.random((16, 16)) * 65535).astype(np.uint16)
    p16 = tmp_path / "g16.png"
    Image.fromarray(g16, "I;16").save(p16)
    nat16 = native_decode.decode_batch_native([p16], 16, 16)
    np.testing.assert_allclose(
        nat16[0, :, :, 0], g16.astype(np.float32) / 65535.0, atol=1e-6
    )


def test_native_error_on_missing_file(tmp_path):
    with pytest.raises(IOError):
        native_decode.decode_batch_native([tmp_path / "nope.png"], 8, 8)


def test_loader_uses_native(dataset):
    loader = Loader(PairedIndex(str(dataset), "train", "X2"), 4, use_native="always")
    assert loader._native_sizes == ((32, 32), (64, 64))
    lr, hr = next(iter(loader))
    assert lr.shape == (4, 32, 32, 1) and hr.shape == (4, 64, 64, 1)
    # identical to the PIL path
    loader_pil = Loader(PairedIndex(str(dataset), "train", "X2"), 4, use_native="never")
    lr2, hr2 = next(iter(loader_pil))
    np.testing.assert_allclose(lr, lr2, atol=1e-6)
    np.testing.assert_allclose(hr, hr2, atol=1e-6)

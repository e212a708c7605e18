"""Pixel-shuffle / window op parity vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

from tpu_superresolution_tpu.ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from tpu_superresolution_tpu.ops.window import (
    cyclic_shift,
    cyclic_unshift,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_pixel_shuffle_matches_torch(rng):
    for r in (2, 3, 4):
        x = rng.random((2, 5, 6, 7 * r * r), dtype=np.float32)
        ours = np.asarray(pixel_shuffle(x, r))
        ref = F.pixel_shuffle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), r)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        np.testing.assert_array_equal(ours, ref)


def test_pixel_unshuffle_roundtrip(rng):
    x = rng.random((2, 8, 8, 12), dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle(pixel_unshuffle(x, 2), 2)), x
    )


def test_window_partition_reverse_roundtrip(rng):
    x = rng.random((2, 16, 24, 5), dtype=np.float32)
    wins = window_partition(x, 8)
    assert wins.shape == (2 * 2 * 3, 64, 5)
    back = window_reverse(wins, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_torch_layout(rng):
    """Same flattening order as the reference's window_partition
    (network_swinir.py:33-47): windows enumerate row-major over (b, h-win,
    w-win) and tokens row-major within the window."""
    x = rng.random((1, 4, 4, 1), dtype=np.float32)
    wins = np.asarray(window_partition(x, 2))
    # window 0 = top-left 2x2 block
    np.testing.assert_array_equal(
        wins[0, :, 0], x[0, :2, :2, 0].reshape(-1)
    )
    # window 1 = top-right
    np.testing.assert_array_equal(
        wins[1, :, 0], x[0, :2, 2:, 0].reshape(-1)
    )


def test_cyclic_shift_matches_torch_roll(rng):
    x = rng.random((1, 8, 8, 2), dtype=np.float32)
    ours = np.asarray(cyclic_shift(x, 3))
    ref = torch.roll(torch.from_numpy(x), shifts=(-3, -3), dims=(1, 2)).numpy()
    np.testing.assert_array_equal(ours, ref)
    np.testing.assert_array_equal(np.asarray(cyclic_unshift(ours, 3)), x)


def test_relative_position_index_properties():
    ws = 8
    idx = relative_position_index(ws)
    assert idx.shape == (ws * ws, ws * ws)
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
    # diagonal (zero offset) maps to the center entry
    center = (ws - 1) * (2 * ws - 1) + (ws - 1)
    assert np.all(np.diag(idx) == center)
    # symmetry: idx[i, j] + idx[j, i] pairs mirror around center
    assert idx[0, ws * ws - 1] + idx[ws * ws - 1, 0] == 2 * center


def test_shift_attn_mask_reference_semantics():
    """Mirror SwinIR's calculate_mask (network_swinir.py:216-237) built
    with torch and compare."""
    h = w = 16
    ws, shift = 8, 4
    img_mask = torch.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = (
        img_mask.view(1, h // ws, ws, w // ws, ws, 1)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws * ws)
    )
    ref = mw.unsqueeze(1) - mw.unsqueeze(2)
    ref = torch.where(ref != 0, torch.tensor(-100.0), torch.tensor(0.0)).numpy()
    ours = shift_attn_mask(h, w, ws, shift)
    np.testing.assert_array_equal(ours, ref)


def test_shift_attn_mask_zero_shift_is_zero():
    m = shift_attn_mask(16, 16, 8, 0)
    assert m.shape == (4, 64, 64)
    assert np.all(m == 0)

"""MRCCM2D pipeline: MATLAB .mat volumes -> paired 2D slice dataset.

The reference's prepare_mrccm.py / mat_eval_mrccm.py are lost from the
checkout, but their CLIs are documented (common_commands.txt:1-3,8-11):
prepare takes one LR volume + named HR volumes (--hr NAME=path) with
--force_4x, writing an out_root that train.py/evaluate.py consume like
DeepRockSR (results.ipynb cells 53-55 report UNet2D numbers on it);
mat_eval evaluates a checkpoint directly on paired LR/HR .mat volumes
with --limit_pairs.

Design decisions (the originals are unrecoverable):
- volumes are sliced along axis 0;
- each volume is min-max normalized to [0,1] before slicing (robust for
  CT intensity ranges), slices stored as 16-bit grayscale PNG;
- --force_4x bicubic-resizes each LR slice to exactly HR/4;
- slices split deterministically by index: 80% train / 10% valid / 10%
  test, interleaved (i % 10).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


def load_mat_volume(path, key: Optional[str] = None) -> np.ndarray:
    """Load a 3-D array from a .mat file (classic via scipy.io, v7.3 via
    h5py).  Picks `key` or the largest non-meta array."""
    path = str(path)
    arrays = {}
    try:
        from scipy.io import loadmat

        m = loadmat(path)
        arrays = {k: v for k, v in m.items() if not k.startswith("__")}
    except NotImplementedError:  # v7.3 HDF5-based
        import h5py

        with h5py.File(path, "r") as f:
            arrays = {k: np.asarray(f[k]) for k in f.keys()}
    if not arrays:
        raise ValueError(f"no arrays found in {path}")
    if key is not None:
        arr = arrays[key]
    else:
        arr = max(arrays.values(), key=lambda a: np.asarray(a).size)
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3:
        raise ValueError(f"expected 2-D/3-D volume in {path}, got {arr.shape}")
    return arr


def normalize_volume(vol: np.ndarray) -> np.ndarray:
    vol = vol.astype(np.float64)
    mn, mx = vol.min(), vol.max()
    if mx <= mn:
        return np.zeros_like(vol, dtype=np.float32)
    return ((vol - mn) / (mx - mn)).astype(np.float32)


def _save_slice_png(slice01: np.ndarray, path: Path):
    from PIL import Image

    arr = np.clip(slice01, 0.0, 1.0)
    u16 = (arr * 65535.0 + 0.5).astype(np.uint16)
    Image.fromarray(u16).save(str(path))


def _split_of(i: int) -> str:
    r = i % 10
    if r < 8:
        return "train"
    return "valid" if r == 8 else "test"


def prepare_mrccm(
    lr_mat,
    hr_mats: Dict[str, str],
    out_root,
    scale: str = "X4",
    force_4x: bool = False,
    limit_slices: Optional[int] = None,
) -> Dict[str, int]:
    """Write a DeepRock-layout paired dataset from .mat volumes.

    The LR volume is shared; each named HR volume contributes its slices
    (paired by slice index with the LR volume).  Returns per-split
    counts.
    """
    from tpu_superresolution_tpu.ops.resize import resize_bicubic

    out_root = Path(out_root)
    s = int(scale[1:])
    lr_vol = normalize_volume(load_mat_volume(lr_mat))

    dirs = {}
    for split in ("train", "valid", "test"):
        hr_dir = out_root / "shuffled2D" / f"shuffled2D_{split}_HR"
        lr_dir = out_root / "shuffled2D" / f"shuffled2D_{split}_LR_default_{scale}"
        hr_dir.mkdir(parents=True, exist_ok=True)
        lr_dir.mkdir(parents=True, exist_ok=True)
        dirs[split] = (hr_dir, lr_dir)

    counts = {"train": 0, "valid": 0, "test": 0}
    idx = 0
    for name, hr_path in hr_mats.items():
        hr_vol = normalize_volume(load_mat_volume(hr_path))
        n = min(hr_vol.shape[0], lr_vol.shape[0])
        if limit_slices is not None:
            n = min(n, limit_slices)
        for i in range(n):
            hr_sl = hr_vol[i]
            lr_sl = lr_vol[i]
            if force_4x:
                th, tw = hr_sl.shape[0] // s, hr_sl.shape[1] // s
                if lr_sl.shape != (th, tw):
                    lr_sl = np.asarray(
                        resize_bicubic(lr_sl[..., None].astype(np.float32), th, tw)
                    )[..., 0]
            split = _split_of(idx)
            hr_dir, lr_dir = dirs[split]
            stem = f"{name}_{i:05d}"
            _save_slice_png(hr_sl, hr_dir / f"{stem}.png")
            _save_slice_png(lr_sl, lr_dir / f"{stem}x{s}.png")
            counts[split] += 1
            idx += 1
    return counts


def mat_volume_pairs(
    lr_mat, hr_mat, limit_pairs: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Paired (lr, hr) slice stacks [N, h, w, 1] float32 [0,1] for
    direct .mat evaluation (mat_eval_mrccm.py capability)."""
    lr_vol = normalize_volume(load_mat_volume(lr_mat))
    hr_vol = normalize_volume(load_mat_volume(hr_mat))
    n = min(lr_vol.shape[0], hr_vol.shape[0])
    if limit_pairs is not None:
        n = min(n, limit_pairs)
    return lr_vol[:n][..., None], hr_vol[:n][..., None]

"""Host-side image decode: PIL -> float32 [0,1] HWC numpy.

This is the only pixel work done on host (the reference does ALL
transforms on host in DataLoader workers — sr_transforms.py; here
decode is host, everything else is jit'd on TPU).  Mode handling
mirrors PairGrayscale/PairToTensor01 (sr_transforms.py:26-52,125-133):
16-bit modes L/I;16/I/F pass through scaled, RGB converts via the
ITU-R 601 luma weights torchvision Grayscale uses.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

_LUMA = np.asarray([0.2989, 0.587, 0.114], dtype=np.float32)


def decode_image(path, grayscale: bool = True, channels: int = 1) -> np.ndarray:
    """Decode to float32 [0,1], shape [H, W, channels]."""
    with Image.open(path) as im:
        mode = im.mode
        arr = np.asarray(im)
    if arr.dtype == np.uint8:
        x = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        x = arr.astype(np.float32) / 65535.0
    elif arr.dtype == np.int32:  # PIL 'I'
        x = arr.astype(np.float32) / 65535.0
    else:  # float modes: assume already [0,1]
        x = arr.astype(np.float32)
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[2] == 4:  # drop alpha
        x = x[:, :, :3]
    if grayscale and x.shape[2] == 3:
        x = (x @ _LUMA)[:, :, None]
    if x.shape[2] == 1 and channels == 3:
        x = np.repeat(x, 3, axis=2)  # _ensure_3ch (finetune_swinir.py:80-88)
    elif channels == 1 and x.shape[2] == 3 and not grayscale:
        x = (x @ _LUMA)[:, :, None]
    return x


def load_pair_batch(
    pairs: Sequence[Tuple[Path, Path]],
    grayscale: bool = True,
    channels: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a list of (lr_path, hr_path) into stacked [B,h,w,C] /
    [B,H,W,C] arrays.  Requires uniform sizes within the batch (DeepRockSR
    splits are uniform; the eval tiler handles mixed sizes upstream)."""
    lrs = [decode_image(lp, grayscale, channels) for lp, _ in pairs]
    hrs = [decode_image(hp, grayscale, channels) for _, hp in pairs]
    return np.stack(lrs), np.stack(hrs)

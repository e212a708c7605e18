"""Tiny synthetic DeepRockSR-layout dataset for tests and CLI smokes."""

from pathlib import Path

import numpy as np
from PIL import Image


def make_deeprock_dataset(
    root,
    splits=("train", "valid", "test"),
    n_per_split=6,
    hr_size=64,
    scale="X2",
    seed=0,
):
    """Create root/shuffled2D/shuffled2D_{split}_{HR|LR_default_scale}
    with bicubic-downscaled LR images named <stem>x{s} (the DeepRockSR
    naming the reference strips — sr_datasets.py:24-29)."""
    root = Path(root)
    s = int(scale[1:])
    rng = np.random.default_rng(seed)
    for split in splits:
        hr_dir = root / "shuffled2D" / f"shuffled2D_{split}_HR"
        lr_dir = root / "shuffled2D" / f"shuffled2D_{split}_LR_default_{scale}"
        hr_dir.mkdir(parents=True, exist_ok=True)
        lr_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_split):
            # smooth-ish random image so SR training is learnable
            small = rng.random((hr_size // 4, hr_size // 4)) * 255
            img = Image.fromarray(small.astype(np.uint8), mode="L").resize(
                (hr_size, hr_size), Image.BICUBIC
            )
            img.save(hr_dir / f"{split}_{i:04d}.png")
            lr = img.resize((hr_size // s, hr_size // s), Image.BICUBIC)
            lr.save(lr_dir / f"{split}_{i:04d}x{s}.png")
    return root

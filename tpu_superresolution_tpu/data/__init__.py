from .index import PairedIndex, strip_lr_suffix
from .decode import decode_image, load_pair_batch
from .transforms import (
    pre_upscale_batch,
    paired_random_crop,
    paired_random_crop_native,
    paired_random_flips,
    make_train_batch_preupscale,
    make_train_batch_native,
)
from .loader import Loader

__all__ = [
    "PairedIndex",
    "strip_lr_suffix",
    "decode_image",
    "load_pair_batch",
    "pre_upscale_batch",
    "paired_random_crop",
    "paired_random_crop_native",
    "paired_random_flips",
    "make_train_batch_preupscale",
    "make_train_batch_native",
    "Loader",
]

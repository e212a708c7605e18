from .resize import resize_bicubic, resize_bilinear, upscale_lr_to_hr
from .metrics import psnr, batch_psnr, ssim
from .pixelshuffle import pixel_shuffle, pixel_unshuffle
from .window import window_partition, window_reverse, cyclic_shift

__all__ = [
    "resize_bicubic",
    "resize_bilinear",
    "upscale_lr_to_hr",
    "psnr",
    "batch_psnr",
    "ssim",
    "pixel_shuffle",
    "pixel_unshuffle",
    "window_partition",
    "window_reverse",
    "cyclic_shift",
]

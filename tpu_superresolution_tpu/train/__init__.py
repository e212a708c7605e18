from .losses import get_loss, l1_loss, mse_loss, l1_ssim_loss
from .schedules import build_schedule
from .freeze import freeze_mask, apply_freeze
from .engine import TrainState, Trainer, make_train_step, make_eval_step

__all__ = [
    "get_loss",
    "l1_loss",
    "mse_loss",
    "l1_ssim_loss",
    "build_schedule",
    "freeze_mask",
    "apply_freeze",
    "TrainState",
    "Trainer",
    "make_train_step",
    "make_eval_step",
]

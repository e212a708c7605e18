"""LR schedules as optax step-based schedules.

Reference semantics:
- OneCycle (train.py:308-319): torch OneCycleLR, max_lr=lr,
  pct_start=0.1, cosine anneal, div_factor=10, final_div_factor=100,
  stepped per-BATCH.
- Exponential (train.py:321-328): gamma = 0.5 ** (1/50), stepped
  per-EPOCH (halves the LR every 50 epochs).
- Cosine (finetune_swinir.py:307-309): CosineAnnealingLR T_max=epochs,
  eta_min=min_lr, stepped per-EPOCH.

optax schedules are functions of the update step, so per-epoch torch
schedules are expressed with steps_per_epoch granularity (LR constant
within an epoch — identical trajectory).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def onecycle(
    lr: float, total_steps: int, pct_start: float = 0.1,
    div_factor: float = 10.0, final_div_factor: float = 100.0,
):
    """torch OneCycleLR(cos) exact phase boundaries: warm phase ends at
    step pct_start*total - 1, anneal phase ends at total - 1; cosine
    interpolation lr = end + (start-end)/2 * (1+cos(pi*pct))."""
    initial = lr / div_factor
    final = initial / final_div_factor
    warm_end = float(pct_start * total_steps) - 1.0
    last = float(total_steps - 1)

    def _cos(a, b, t):
        import jax.numpy as jnp

        return b + (a - b) * (1 + jnp.cos(jnp.pi * t)) / 2.0

    def sched(step):
        import jax.numpy as jnp

        step = jnp.minimum(step.astype(jnp.float32) if hasattr(step, "astype") else jnp.asarray(step, jnp.float32), last)
        up_t = jnp.clip(step / jnp.maximum(warm_end, 1e-9), 0.0, 1.0)
        down_t = jnp.clip(
            (step - warm_end) / jnp.maximum(last - warm_end, 1e-9), 0.0, 1.0
        )
        return jnp.where(step <= warm_end, _cos(initial, lr, up_t), _cos(lr, final, down_t))

    return sched


def exponential_per_epoch(
    lr: float, steps_per_epoch: int, drop_every: int = 50, decay_factor: float = 0.5
):
    gamma = decay_factor ** (1.0 / drop_every)

    def sched(step):
        import jax.numpy as jnp

        epoch = jnp.asarray(step) // max(1, steps_per_epoch)
        return lr * jnp.power(gamma, epoch.astype(jnp.float32))

    return sched


def cosine_per_epoch(lr: float, epochs: int, steps_per_epoch: int, min_lr: float):
    def sched(step):
        import jax.numpy as jnp

        epoch = jnp.minimum(jnp.asarray(step) // max(1, steps_per_epoch), epochs)
        return min_lr + (lr - min_lr) * (
            1 + jnp.cos(jnp.pi * epoch / max(1, epochs))
        ) / 2.0

    return sched


def build_schedule(
    name: str,
    lr: float,
    epochs: int,
    steps_per_epoch: int,
    min_lr: float = 1e-7,
):
    name = name.lower()
    if name in ("none", ""):
        return lr  # constant
    if name == "onecycle":
        return onecycle(lr, epochs * steps_per_epoch)
    if name == "exponential":
        return exponential_per_epoch(lr, steps_per_epoch)
    if name == "cosine":
        return cosine_per_epoch(lr, epochs, steps_per_epoch, min_lr)
    raise ValueError(f"Unknown scheduler '{name}'")

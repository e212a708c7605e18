"""Shared CLI plumbing."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def report_devices(log=print):
    devs = jax.devices()
    log(f"[device] {devs[0].platform} x{len(devs)}: {devs}")
    return devs


def seed_everything(seed: int):
    """Reference seed_everything (train.py:34-37) analog: numpy host RNG
    + the jax key returned for the functional chain."""
    np.random.seed(seed)
    return jax.random.key(seed)


def resolve_workers(workers):
    if workers is not None:
        return workers
    cpu = os.cpu_count() or 4
    return min(8, max(2, cpu // 2))

"""Shared CLI plumbing."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def enable_persistent_compile_cache(path=None, log=print):
    """Opt-in persistent XLA compilation cache: compiles over the
    remote-compile tunnel cost seconds to minutes, and every CLI
    restart repays them.  Enabled when `path` or the
    TPU_SR_COMPILE_CACHE env var is set (JAX's own
    JAX_COMPILATION_CACHE_DIR works too — this is the framework-level
    switch that all CLIs check)."""
    path = path or os.environ.get("TPU_SR_COMPILE_CACHE")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    log(f"[cache] persistent compilation cache at {path}")
    return path


def report_devices(log=print):
    enable_persistent_compile_cache(log=log)
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

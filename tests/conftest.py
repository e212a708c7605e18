"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU via
``--xla_force_host_platform_device_count`` (the standard JAX fake
multi-device trick — SURVEY.md §4); the reference has no equivalent
(single-GPU, no distributed code).  Env vars must be set before the
first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize) can pin the platform before env
# vars are read; the config update below overrides it reliably.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

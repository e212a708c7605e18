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

# ---------------------------------------------------------------------
# Fast/slow test tiers (VERDICT r3 item 7).  The default run excludes
# tests marked `slow` (pyproject addopts `-m "not slow"`) to keep the
# iteration loop a few minutes; the full 294-test suite (torch golden
# parity, CLI e2e, DP-mesh compiles — ~30 min) runs with
# `pytest -q -m ""` at round end / CI.  Markers are applied centrally
# here from measured durations (2026-08-19, --durations=60) instead of
# per-file decorators so the tier list lives in one place.
# ---------------------------------------------------------------------

# Whole modules whose tests are dominated by torch-reference golden
# setups, CLI end-to-end train/evaluate runs, or 8-device mesh compiles.
_SLOW_MODULES = {
    "test_cli",
    "test_cli_finetune",
    "test_parity_swinir",
    "test_parity_hat",
    "test_parity_dat",
    "test_parity_msresunet",
    "test_torch_export",
    "test_models_cnn",
    "test_drop_path",
    "test_graft_entry",
    "test_parallel",
    "test_train",
    "test_absorb_rolls",
    # interpret-mode Pallas kernel parity (minutes of trace time) and
    # CLI/e2e evaluate flows — kernel edits should run `-m ""`.
    "test_fused_attention",
    "test_fused_ocab",
    "test_evaluate",
    "test_extended_aug",
    "test_serve",
}

# Individual heavy tests inside otherwise-fast modules (>=10 s each).
_SLOW_TESTS = {
    "test_hat_fused_impl_grads",
    "test_swinir_fused_impl_grads",
    "test_hat_spatial_packed_toggle",
    "test_dat_spatial_attention_kernel_matches_jnp",
    "test_spatial_megakernel_vjp_fallback",
    "test_hat_fused_impl_matches_jnp",
    "test_packed_megakernel_backward_matches_jnp_vjp",
    "test_hat_fused_cab_toggle",
    "test_grads_match_reference",
    "test_megakernel_backward_matches_jnp_vjp",
    "test_spatial_megakernel_grads",
    "test_prepare_then_mat_eval_cli",
    "test_tiled_forward_geometry_sweep",
    "test_sharded_tiled_max_tile_batch_matches_unchunked",
    "test_hat_remat",
    "test_swinir_fused_reconstruct_param_compatible",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if item.module.__name__ in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

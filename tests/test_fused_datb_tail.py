"""Fused DATB tail (ops/pallas/fused_datb_tail.py): the AIM + proj +
LN2 + SGFN kernel must match the reference module chain (which is
golden-tested against modules/dat_arch.py in test_parity_dat.py) and
must not change the checkpoint param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.core import DATConfig, build_model
from tpu_superresolution_tpu.ops.pallas import fused_datb_tail as ft


@pytest.fixture(autouse=True)
def _restore_flag():
    old = ft.FUSED_TAIL
    yield
    ft.FUSED_TAIL = old


def _small_cfg(**kw):
    base = dict(
        embed_dim=32, depths=(2, 2), num_heads=(2, 2), split_size=(4, 8),
        scale=2, img_size=16, upsampler="pixelshuffledirect",
        drop_path_rate=0.0,
    )
    base.update(kw)
    return DATConfig(**base)


def test_fused_tail_matches_module_chain():
    """Covers all four DATB flavours (spatial/channel x shift on/off:
    depths (2,2) gives rg0 j0 spatial unshifted, rg0 j1 channel, rg1 j0
    spatial shifted, rg1 j1 channel)."""
    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 24, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_fused_tail_param_tree_identical():
    """The raw-params declaration path must produce the exact tree the
    module path produces (checkpoints must be flag-independent)."""
    m = build_model(_small_cfg())
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    ft.FUSED_TAIL = "off"
    v0 = m.init(jax.random.key(0), x, train=False)
    ft.FUSED_TAIL = "on"
    v1 = m.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(v0),
        jax.tree_util.tree_leaves_with_path(v1),
    ):
        assert p0 == p1
        assert a.shape == b.shape and a.dtype == b.dtype


def test_fused_tail_respects_trained_bn_stats():
    """The BN fold must use the checkpoint's running stats, not the
    init values."""
    m = build_model(_small_cfg(depths=(2,), num_heads=(2,)))
    x = jnp.asarray(
        np.random.default_rng(1).random((1, 16, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    v = m.init(jax.random.key(0), x, train=False)
    # perturb every BN running stat as training would
    rng = np.random.default_rng(2)

    def bump(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "batch_stats" not in str(names):
            return leaf
        return leaf + jnp.asarray(
            0.3 * rng.standard_normal(leaf.shape), leaf.dtype
        )

    stats = jax.tree_util.tree_map_with_path(bump, v["batch_stats"])
    v = dict(v, batch_stats=stats)
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_fused_tail_gate_odd_heights_fall_back():
    """Heights that don't divide into strips refuse the kernel (the
    module path must be taken, not a crash)."""
    m = build_model(_small_cfg(depths=(2,), num_heads=(2,)))
    x = jnp.asarray(
        np.random.default_rng(3).random((1, 20, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"  # H=20 % 8 != 0 -> fused_tail_ok False
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=0)

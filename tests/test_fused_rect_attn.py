"""Fused dual-rect attention kernel (ops/pallas/fused_rect_attn.py):
with the fused tail it replaces the whole spatial-DATB module chain —
must match it numerically and keep the checkpoint tree unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.core import DATConfig, build_model
from tpu_superresolution_tpu.ops.pallas import fused_datb_tail as ft
from tpu_superresolution_tpu.ops.pallas import fused_rect_attn as fr


@pytest.fixture(autouse=True)
def _restore_flags():
    old = ft.FUSED_TAIL, fr.FUSED_RECT, fr.FUSED_RECT_SHIFTED
    yield
    ft.FUSED_TAIL, fr.FUSED_RECT, fr.FUSED_RECT_SHIFTED = old


def _small_cfg(**kw):
    base = dict(
        embed_dim=32, depths=(2, 2), num_heads=(2, 2), split_size=(4, 8),
        scale=2, img_size=16, upsampler="pixelshuffledirect",
        drop_path_rate=0.0,
    )
    base.update(kw)
    return DATConfig(**base)


def test_rect_kernel_matches_module_chain():
    """Full DAT forward, kernel path (rect + tail) vs module path —
    covers unshifted AND shifted spatial blocks plus channel blocks
    (depths (2,2): rg0 j0 unshifted, rg1 j0 shifted)."""
    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 24, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"
    fr.FUSED_RECT = "on"
    fr.FUSED_RECT_SHIFTED = "on"
    v1 = m.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v1
    )
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_rect_kernel_with_module_tail():
    """Rect kernel feeding the regular AIM+proj+LN2+SGFN modules
    (FUSED_TAIL off) — the production pairing at 256^2-class shapes
    where the tail dwconv is Mosaic-rejected but the rect kernel
    compiles (fused_tail_diag4 / fused_rect_diag2)."""
    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(7).random((2, 24, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    fr.FUSED_RECT = "on"
    fr.FUSED_RECT_SHIFTED = "on"
    v1 = m.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v1
    )
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_rect_shifted_gate_falls_back():
    """FUSED_RECT_SHIFTED="off" (production default while the shifted
    kernel is Mosaic-rejected at 256^2): shifted spatial blocks take
    the module branches, unshifted blocks fuse — parity must hold."""
    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(8).random((2, 24, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    fr.FUSED_RECT = "on"
    fr.FUSED_RECT_SHIFTED = "off"
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_rect_kernel_respects_trained_conv_bn_stats():
    """The conv-branch BN fold must track checkpoint running stats."""
    m = build_model(_small_cfg(depths=(2,), num_heads=(2,)))
    x = jnp.asarray(
        np.random.default_rng(1).random((1, 16, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    v = m.init(jax.random.key(0), x, train=False)
    rng = np.random.default_rng(2)

    def bump(path, leaf):
        if "batch_stats" not in str([getattr(p, "key", "") for p in path]):
            return leaf
        return leaf + jnp.asarray(
            0.3 * rng.standard_normal(leaf.shape), leaf.dtype
        )

    v = dict(v, batch_stats=jax.tree_util.tree_map_with_path(
        bump, v["batch_stats"]
    ))
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"
    fr.FUSED_RECT = "on"
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_rect_gate_falls_back_when_ineligible():
    """H a strip multiple for the tail (8) but not for the rect kernel
    (max split 16): the rect gate must refuse and take the module
    branches while the tail kernel still runs — output must match the
    all-module chain."""
    m = build_model(
        _small_cfg(depths=(2,), num_heads=(2,), split_size=(8, 16))
    )
    x = jnp.asarray(
        np.random.default_rng(3).random((1, 24, 32, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"
    fr.FUSED_RECT = "on"  # fused_rect_ok(24, 32, 8, 16) is False
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )

"""Fused XCiT channel-attention kernel (ops/pallas/fused_channel_attn):
the two-phase gram-accumulate/apply kernel must match the module
channel-block chain numerically and keep the checkpoint tree
unchanged (reference semantics: dat_arch.py:441-509)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.core import DATConfig, build_model
from tpu_superresolution_tpu.ops.pallas import fused_channel_attn as fc
from tpu_superresolution_tpu.ops.pallas import fused_datb_tail as ft
from tpu_superresolution_tpu.ops.pallas import fused_rect_attn as fr


@pytest.fixture(autouse=True)
def _restore_flags():
    old = ft.FUSED_TAIL, fr.FUSED_RECT, fc.FUSED_CHAN
    yield
    ft.FUSED_TAIL, fr.FUSED_RECT, fc.FUSED_CHAN = old


def _small_cfg(**kw):
    base = dict(
        embed_dim=32, depths=(2, 2), num_heads=(2, 2), split_size=(4, 8),
        scale=2, img_size=16, upsampler="pixelshuffledirect",
        drop_path_rate=0.0,
    )
    base.update(kw)
    return DATConfig(**base)


def test_chan_kernel_matches_module_chain():
    """Full DAT forward with the channel kernel + module tail vs the
    all-module chain (depths (2,2): one channel block per group)."""
    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 24, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    fc.FUSED_CHAN = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    fc.FUSED_CHAN = "on"
    v1 = m.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v1
    )
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_chan_kernel_with_fused_tail_and_rect():
    """All three inference kernels together: rect front (spatial),
    channel front, fused tail — the fully-fused DAT forward."""
    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(4).random((2, 24, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    fc.FUSED_CHAN = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    ft.FUSED_TAIL = "on"
    fr.FUSED_RECT = "on"
    fc.FUSED_CHAN = "on"
    v1 = m.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v1
    )
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_chan_kernel_respects_trained_bn_stats():
    """The conv-branch BN fold must track checkpoint running stats."""
    m = build_model(_small_cfg(depths=(2,), num_heads=(2,)))
    x = jnp.asarray(
        np.random.default_rng(1).random((1, 16, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    fc.FUSED_CHAN = "off"
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
    fc.FUSED_CHAN = "on"
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_chan_gate_falls_back_when_ineligible():
    """H not a strip multiple: the gate must refuse and the module
    chain must run (identical output with the flag on)."""
    m = build_model(_small_cfg(depths=(2,), num_heads=(2,)))
    x = jnp.asarray(
        np.random.default_rng(3).random((1, 20, 16, 3), np.float32)
    )
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    fc.FUSED_CHAN = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    fc.FUSED_CHAN = "on"  # fused_chan_ok(20, 16) is False (20 % 8)
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_chan_kernel_batch_resets_accumulators():
    """b=3: the gram/norm scratch must re-zero at each batch element
    (a leak across batch would corrupt elements 2 and 3)."""
    m = build_model(_small_cfg(depths=(2,), num_heads=(2,)))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((3, 16, 16, 3), np.float32))
    ft.FUSED_TAIL = "off"
    fr.FUSED_RECT = "off"
    fc.FUSED_CHAN = "off"
    v = m.init(jax.random.key(0), x, train=False)
    y0 = m.apply(v, x, train=False)
    fc.FUSED_CHAN = "on"
    y1 = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )


def test_chan_blockdiag_xla_impl_matches_heads():
    """CHAN_ATTN_IMPL="blockdiag" (full-[C,C] masked formulation) must
    match the reference-shaped per-head einsums (dat.py docstring:
    normalization factorizes; one masked softmax == nh per-head
    softmaxes)."""
    import tpu_superresolution_tpu.models.dat as datmod

    m = build_model(_small_cfg())
    x = jnp.asarray(
        np.random.default_rng(9).random((2, 24, 16, 3), np.float32)
    )
    old = datmod.CHAN_ATTN_IMPL
    try:
        datmod.CHAN_ATTN_IMPL = "heads"
        v = m.init(jax.random.key(0), x, train=False)
        y0 = m.apply(v, x, train=False)
        datmod.CHAN_ATTN_IMPL = "blockdiag"
        v1 = m.init(jax.random.key(0), x, train=False)
        assert jax.tree_util.tree_structure(
            v
        ) == jax.tree_util.tree_structure(v1)
        y1 = m.apply(v, x, train=False)
    finally:
        datmod.CHAN_ATTN_IMPL = old
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=0
    )

"""Roll-absorbing megakernel reads (fused_block.ABSORB_ROLLS): the
shifted-window rolls ride the kernel's strip reads (neighbor blocks +
VMEM assembly) instead of jnp.roll passes.  Parity vs the roll-based
production path across the read regimes:

- rows in-block (nchunks == 1), columns cross-block
- rows cross-block (nchunks > 1, forced via max_p)
- folded pairs (in-block per-sample segment rolls)
- odd-batch remainder split (folded main + unfolded tail)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_superresolution_tpu.ops.pallas.fused_block as fb
from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.ops.window import cyclic_shift, cyclic_unshift
from tpu_superresolution_tpu.ops.window import shift_attn_mask


def _tiny_swinir(**kw):
    kw.setdefault("drop_path_rate", 0.0)
    cfg = SwinIRConfig(
        scale=2, img_size=32, window_size=8, embed_dim=12,
        depths=(2, 2), num_heads=(2, 2), mlp_ratio=2.0,
        attention_impl="fused", upsampler="pixelshuffledirect", **kw,
    )
    return cfg, build_model(cfg)


@pytest.mark.parametrize("batch", [1, 2, 3])
def test_swinir_forward_matches_roll_path(batch):
    """Whole-model parity: ABSORB_ROLLS on == off (b=2 folds, b=3 takes
    the odd-batch remainder split)."""
    cfg, model = _tiny_swinir()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 32, 32, 3), np.float32))
    v = model.init(jax.random.key(0), x[:1], train=False)

    # Compare both settings regardless of the production default
    # (flipped True 2026-08-19 after the on-chip A/B win — absorb is
    # bitwise-identical on hardware; this pins the CPU interpret path).
    saved = fb.ABSORB_ROLLS
    try:
        fb.ABSORB_ROLLS = False
        ref = model.apply(v, x, train=False)
        fb.ABSORB_ROLLS = True
        out = model.apply(v, x, train=False)
    finally:
        fb.ABSORB_ROLLS = saved
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0
    )


@pytest.mark.parametrize("drop_path", [0.0, 0.3])
def test_absorb_train_grads_match_roll_path(drop_path):
    """ABSORB_TRAIN: a training (non-deterministic) forward+backward
    through the absorbed path must match the explicit-roll path —
    including the drop-path branch_scales x read_shift cross (the
    scales are sampled outside the kernel from the same rng stream, so
    both paths see identical masks)."""
    cfg, model = _tiny_swinir(drop_path_rate=drop_path)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    v = model.init(jax.random.key(0), x, train=False)

    def loss_fn(p):
        out = model.apply(
            {"params": p}, x, train=True,
            rngs={"drop_path": jax.random.key(7)},
        )
        return jnp.mean(out**2)

    saved = fb.ABSORB_TRAIN
    try:
        fb.ABSORB_TRAIN = False
        l_ref, g_ref = jax.value_and_grad(loss_fn)(v["params"])
        fb.ABSORB_TRAIN = True
        l_abs, g_abs = jax.value_and_grad(loss_fn)(v["params"])
    finally:
        fb.ABSORB_TRAIN = saved
    np.testing.assert_allclose(float(l_abs), float(l_ref), atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_abs), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=0
        )


def _raw_block_weights(rng, c, nh, n, mlp=2.0):
    r = lambda *s: jnp.asarray(rng.normal(0, 0.08, s), jnp.float32)
    hid = int(c * mlp)
    return dict(
        g1=jnp.ones((c,)), b1=r(c), wqkv=r(c, 3 * c), bqkv=r(3 * c),
        wproj=r(c, c), bproj=r(c), g2=jnp.ones((c,)), b2=r(c),
        wfc1=r(c, hid), bfc1=r(hid), wfc2=r(hid, c), bfc2=r(c),
        bias=r(nh, n, n),
    )


@pytest.mark.parametrize("shift_sign", [1, -1])
@pytest.mark.parametrize("max_p", [16, 2])
def test_mega_forward_read_shift_matches_rolls(shift_sign, max_p):
    """Kernel-level parity incl. the cross-block row regime (max_p=2
    forces nchunks=2 at nwh=4)."""
    ws, h, w, c, nh, b = 8, 32, 32, 12, 2, 1
    n = ws * ws
    rng = np.random.default_rng(1)
    wts = _raw_block_weights(rng, c, nh, n)
    x = jnp.asarray(rng.random((b, h, w, c), np.float32))
    scales = jnp.ones((b, 2), jnp.float32)
    v = shift_sign * (ws // 2)
    # compute coordinates shifted by max(v, 0): mask matches the
    # compute-coords partition; the stored array is rolled by ρ = σ - v
    sigma = max(v, 0)
    mask = shift_attn_mask(h, w, ws, sigma) if sigma else None
    stored = cyclic_shift(x, sigma - v)

    common = dict(ws=ws, mask=mask, scale=(c // nh) ** -0.5,
                  gelu_approx=False, interpret=True, max_p=max_p)
    ref = fb._mega_forward(
        cyclic_shift(stored, v), *[wts[k] for k in (
            "g1", "b1", "wqkv", "bqkv", "wproj", "bproj", "g2", "b2",
            "wfc1", "bfc1", "wfc2", "bfc2", "bias")], scales, **common,
    )
    out = fb._mega_forward(
        stored, *[wts[k] for k in (
            "g1", "b1", "wqkv", "bqkv", "wproj", "bproj", "g2", "b2",
            "wfc1", "bfc1", "wfc2", "bfc2", "bias")], scales,
        read_shift=v, **common,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0
    )


def test_mega_forward_read_shift_folded():
    """Folded even batch: the absorbed row wrap stays per original
    sample (in-block segment rolls)."""
    ws, h, w, c, nh, b = 8, 32, 32, 12, 2, 4
    n = ws * ws
    rng = np.random.default_rng(2)
    wts = _raw_block_weights(rng, c, nh, n)
    x = jnp.asarray(rng.random((b, h, w, c), np.float32))
    scales = jnp.ones((b, 2), jnp.float32)
    v = ws // 2
    mask = shift_attn_mask(h, w, ws, v)
    names = ("g1", "b1", "wqkv", "bqkv", "wproj", "bproj", "g2", "b2",
             "wfc1", "bfc1", "wfc2", "bfc2", "bias")
    common = dict(ws=ws, mask=mask, scale=(c // nh) ** -0.5,
                  gelu_approx=False, interpret=True, allow_fold=True)
    stored = cyclic_unshift(x, v)  # stored in true coords, compute at +v
    ref = fb._mega_forward(
        x, *[wts[k] for k in names], scales, **common,
    )
    out = fb._mega_forward(
        stored, *[wts[k] for k in names], scales, read_shift=v, **common,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0
    )


def test_absorb_rolls_reduces_roll_count(monkeypatch):
    """The absorbed path emits ONE roll per RSTB (layer tail) instead
    of two per shifted block."""
    import tpu_superresolution_tpu.models.swinir as swinir_mod

    cfg, model = _tiny_swinir()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    v = model.init(jax.random.key(0), x, train=False)

    calls = []

    def count(fn, tag):
        def wrapped(arr, shift):
            if shift:
                calls.append(tag)
            return fn(arr, shift)
        return wrapped

    monkeypatch.setattr(
        swinir_mod, "cyclic_shift", count(cyclic_shift, "s")
    )
    monkeypatch.setattr(
        swinir_mod, "cyclic_unshift", count(cyclic_unshift, "u")
    )

    def nrolls(absorb):
        calls.clear()
        try:
            fb.ABSORB_ROLLS = absorb
            jax.jit(lambda b: model.apply(v, b, train=False)).lower(x)
        finally:
            fb.ABSORB_ROLLS = False
        return len(calls)

    # depths (2,2): one shifted block per layer -> 2 rolls/layer rolled,
    # 1 tail unroll/layer absorbed.
    assert nrolls(False) == 4
    assert nrolls(True) == 2


def test_read_shift_rejects_extra():
    ws, c, nh, n = 8, 12, 2, 64
    rng = np.random.default_rng(4)
    wts = _raw_block_weights(rng, c, nh, n)
    x = jnp.zeros((1, 16, 16, c), jnp.float32)
    with pytest.raises(AssertionError):
        fb.fused_swin_block(
            x, *[wts[k] for k in (
                "g1", "b1", "wqkv", "bqkv", "wproj", "bproj", "g2", "b2",
                "wfc1", "bfc1", "wfc2", "bfc2", "bias")],
            ws, None, 1.0, False, True, extra=x, read_shift=4,
        )


def test_absorb_composes_with_conv_impls():
    """Post-A/B default flips compose: ABSORB_ROLLS x trunk-conv impl x
    input-conv impl stay bit-consistent with the baseline flags."""
    import tpu_superresolution_tpu.models.blocks as blocks

    cfg, model = _tiny_swinir()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    v = model.init(jax.random.key(0), x[:1], train=False)
    ref = model.apply(v, x, train=False)
    try:
        fb.ABSORB_ROLLS = True
        blocks.CONV3X3_IMPL = "gemm"
        blocks.CONV3X3_INPUT_IMPL = "gemm"
        out = model.apply(v, x, train=False)
    finally:
        fb.ABSORB_ROLLS = False
        blocks.CONV3X3_IMPL = "xla"
        blocks.CONV3X3_INPUT_IMPL = "xla"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5, rtol=0
    )

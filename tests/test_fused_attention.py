"""Parity tests for the fully-fused window-attention kernel
(ops/pallas/fused_attention.py) against its jnp reference, run in
Pallas interpret mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.ops.pallas.fused_attention import (
    _pick_pack,
    _reference_impl,
    fused_window_block_attention,
)


def _inputs(rng, bw=8, n=16, c=24, nh=3, with_mask=True, nwm=4):
    x = jnp.asarray(rng.standard_normal((bw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)).astype(np.float32))
    mask = None
    if with_mask:
        mask = np.where(
            rng.random((nwm, n, n)) > 0.7, -100.0, 0.0
        ).astype(np.float32)
    scale = (c // nh) ** -0.5
    return x, wqkv, bqkv, wproj, bproj, bias, mask, scale


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("bw,nwm", [(8, 4), (6, 3), (16, 4)])
def test_fused_matches_reference(rng, with_mask, bw, nwm):
    args = _inputs(rng, bw=bw, nwm=nwm, with_mask=with_mask)
    ref = _reference_impl(*args)
    out = fused_window_block_attention(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_no_bias_qkv(rng):
    x, wqkv, _, wproj, bproj, bias, mask, scale = _inputs(rng)
    ref = _reference_impl(x, wqkv, None, wproj, bproj, bias, mask, scale)
    out = fused_window_block_attention(
        x, wqkv, None, wproj, bproj, bias, mask, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_bf16_close(rng):
    """bf16 inputs take the production path (bf16 MXU, fp32 accum)."""
    x, wqkv, bqkv, wproj, bproj, bias, mask, scale = _inputs(rng)
    ref = _reference_impl(
        x.astype(jnp.bfloat16), wqkv, bqkv, wproj, bproj, bias, mask, scale
    ).astype(jnp.float32)
    out = fused_window_block_attention(
        x.astype(jnp.bfloat16), wqkv, bqkv, wproj, bproj, bias, mask, scale,
        interpret=True,
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15)


def test_fused_gradients_match_reference(rng):
    """custom_vjp backward == grads of the jnp reference."""
    x, wqkv, bqkv, wproj, bproj, bias, mask, scale = _inputs(rng)

    def loss_fused(x, wq, bq, wp, bp, bi):
        out = fused_window_block_attention(
            x, wq, bq, wp, bp, bi, mask, scale, interpret=True
        )
        return jnp.sum(out ** 2)

    def loss_ref(x, wq, bq, wp, bp, bi):
        return jnp.sum(_reference_impl(x, wq, bq, wp, bp, bi, mask, scale) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias
    )
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_pick_pack():
    assert _pick_pack(64, 16, 64) == 4
    assert _pick_pack(64, None, 64) == 4
    assert _pick_pack(6, 3, 16) == 1
    assert _pick_pack(6, None, 16) == 2
    assert _pick_pack(8, 4, 256) == 2  # 4*256 > 512
    assert _pick_pack(8, 4, 600) == 1


def test_swinir_fused_impl_matches_jnp(rng):
    """Full SwinIR forward: attention_impl='fused' (interpret mode on
    CPU) must match the jnp einsum path — shifted masks included."""
    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

    def cfg(impl):
        # ws=8 keeps the STRIP megakernel geometry (ws%8==0); HAT tests
        # below cover the packed-window fallback geometry (ws=4)
        return SwinIRConfig(
            scale=2, img_size=16, window_size=8, embed_dim=12, depths=(2, 2),
            num_heads=(2, 2), upsampler="pixelshuffledirect",
            attention_impl=impl,
        )

    x = jnp.asarray(rng.random((1, 20, 16, 3), dtype=np.float32))
    m1 = build_model(cfg("jnp"))
    m2 = build_model(cfg("fused"))
    v = m1.init(jax.random.key(0), x, train=False)
    y1 = m1.apply(v, x, train=False)
    y2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


def test_swinir_fused_impl_numpy_params(rng):
    """Fused path must accept a host-numpy param tree: checkpoint
    restore forces leaves to numpy (train/checkpoint.py), and the
    round-4 grains proof crashed in _prep_weights on
    `numpy.ndarray.at` when evaluating a restored SwinIR as-trained."""
    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

    cfg = SwinIRConfig(
        scale=2, img_size=16, window_size=8, embed_dim=12, depths=(2,),
        num_heads=(2,), upsampler="pixelshuffledirect",
        attention_impl="fused",
    )
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    m = build_model(cfg)
    v = m.init(jax.random.key(0), x, train=False)
    v_np = jax.tree.map(lambda a: np.asarray(a), v)
    y = m.apply(v, x, train=False)
    y_np = m.apply(v_np, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_np), atol=1e-6)


def test_swinir_fused_impl_grads(rng):
    """Gradients flow through the fused path (custom_vjp) and match the
    jnp path."""
    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

    def cfg(impl):
        return SwinIRConfig(
            scale=2, img_size=16, window_size=8, embed_dim=12, depths=(2,),
            num_heads=(2,), upsampler="pixelshuffledirect",
            attention_impl=impl,
        )

    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    m1 = build_model(cfg("jnp"))
    m2 = build_model(cfg("fused"))
    v = m1.init(jax.random.key(0), x, train=False)

    def loss(model):
        return lambda p: jnp.mean(model.apply({"params": p}, x, train=False) ** 2)

    g1 = jax.grad(loss(m1))(v["params"])
    g2 = jax.grad(loss(m2))(v["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_hat_fused_impl_matches_jnp(rng):
    """Full HAT forward: attention_impl='fused' routes HAB through the
    megakernel with the CAB branch as the `extra` input (interpret mode
    on CPU); must match the module path — shifted masks included."""
    from tpu_superresolution_tpu.core.config import HATConfig, build_model

    def cfg(impl):
        return HATConfig(
            scale=2, img_size=16, window_size=4, embed_dim=12,
            depths=(2, 2), num_heads=(2, 2), overlap_ratio=0.5,
            compress_ratio=3, squeeze_factor=4,
            mlp_ratio=2.0, attention_impl=impl, drop_path_rate=0.0,
        )

    x = jnp.asarray(rng.random((1, 20, 16, 3), dtype=np.float32))
    m1 = build_model(cfg("jnp"))
    m2 = build_model(cfg("fused"))
    v = m1.init(jax.random.key(0), x, train=False)
    y1 = m1.apply(v, x, train=False)
    y2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


def test_hat_fused_impl_grads(rng):
    """Gradients flow through the HAB fused path (custom_vjp incl. the
    extra/CAB input) and match the module path."""
    from tpu_superresolution_tpu.core.config import HATConfig, build_model

    def cfg(impl):
        return HATConfig(
            scale=2, img_size=16, window_size=4, embed_dim=12,
            depths=(2,), num_heads=(2,), overlap_ratio=0.5,
            compress_ratio=3, squeeze_factor=4,
            mlp_ratio=2.0, attention_impl=impl, drop_path_rate=0.0,
        )

    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    m1 = build_model(cfg("jnp"))
    m2 = build_model(cfg("fused"))
    v = m1.init(jax.random.key(0), x, train=False)

    def loss(model):
        return lambda p: jnp.mean(model.apply({"params": p}, x, train=False) ** 2)

    g1 = jax.grad(loss(m1))(v["params"])
    g2 = jax.grad(loss(m2))(v["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_megakernel_branch_scales_match_reference(rng):
    """fused_swin_block with per-sample branch_scales (stochastic depth
    multipliers) matches the jnp reference composition — training keeps
    the megakernel instead of falling back to the module path."""
    from tpu_superresolution_tpu.ops.pallas.fused_block import (
        _reference_block,
        fused_swin_block,
    )

    b, h, w, c, nh, ws = 3, 8, 8, 12, 3, 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    g1, b1, g2, b2 = r(c), r(c), r(c), r(c)
    wqkv, bqkv = r(c, 3 * c), r(3 * c)
    wproj, bproj = r(c, c), r(c)
    wfc1, bfc1 = r(c, 2 * c), r(2 * c)
    wfc2, bfc2 = r(2 * c, c), r(c)
    bias = r(nh, ws * ws, ws * ws)
    # one sample fully dropped, one kept+rescaled, one mixed
    scales = jnp.asarray([[0.0, 1.25], [1.25, 0.0], [1.25, 1.25]], jnp.float32)
    sc = (c // nh) ** -0.5
    out = fused_swin_block(
        x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
        wfc1, bfc1, wfc2, bfc2, bias, ws, None, sc, False,
        branch_scales=scales,
    )
    ref = _reference_block(
        x, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
        wfc1, bfc1, wfc2, bfc2, bias, scales, ws, None, sc, False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_swinir_fused_train_drop_path_active(rng):
    """SwinIR train-mode with drop_path>0 keeps the fused kernel path:
    output is finite, differs across drop_path keys, and equals the
    deterministic forward when the rate rounds to keep everything."""
    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model

    cfg = SwinIRConfig(
        scale=2, img_size=16, window_size=8, embed_dim=12, depths=(2,),
        num_heads=(2,), upsampler="pixelshuffledirect",
        attention_impl="fused", drop_path_rate=0.5,
    )
    m = build_model(cfg)
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    v = m.init(jax.random.key(0), x, train=False)
    y1 = m.apply(v, x, train=True, rngs={"drop_path": jax.random.key(1)})
    y2 = m.apply(v, x, train=True, rngs={"drop_path": jax.random.key(2)})
    assert bool(jnp.isfinite(y1).all()) and bool(jnp.isfinite(y2).all())
    assert float(jnp.abs(y1 - y2).max()) > 1e-6  # different draws differ


def test_megakernel_tpu_geometry_gate():
    """Mosaic requires block last-two dims (8,128)-divisible or full:
    ws=8 tiles, ws=7 must not (HAT falls back to the packed kernels,
    whose blocks span full last-two dims)."""
    from tpu_superresolution_tpu.ops.pallas.fused_block import (
        megakernel_tpu_ok,
    )

    assert megakernel_tpu_ok(8, 64)
    assert megakernel_tpu_ok(16, 64)
    assert not megakernel_tpu_ok(7, 70)   # HAT production geometry
    assert megakernel_tpu_ok(7, 7)        # single window column is full-dim
    assert not megakernel_tpu_ok(4, 16)


def test_hat_window_attention_fused_branch(rng):
    """WindowAttentionHAT attn_impl='fused' (the ws=7 TPU fallback path:
    qkv+attn+proj packed kernel) matches the jnp einsum path."""
    from tpu_superresolution_tpu.models.hat import WindowAttentionHAT

    b, nw, ws, c, nh = 2, 4, 7, 12, 3
    n = ws * ws
    x = jnp.asarray(rng.random((b, nw, n, c), dtype=np.float32))
    mask = np.where(rng.random((nw, n, n)) > 0.8, -100.0, 0.0).astype(np.float32)
    m1 = WindowAttentionHAT(c, ws, nh, attn_impl="jnp")
    m2 = WindowAttentionHAT(c, ws, nh, attn_impl="fused")
    v = m1.init(jax.random.key(0), x, mask)
    y1 = m1.apply(v, x, mask)
    y2 = m2.apply(v, x, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


@pytest.mark.parametrize("with_mask,with_extra", [(False, False), (True, False), (True, True)])
def test_megakernel_backward_matches_jnp_vjp(rng, with_mask, with_extra):
    """The Pallas backward megakernel (_mega_backward) must produce the
    same gradients as jax.vjp over the jnp reference composition, for
    every input including weights, rpb bias, and the extra branch."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 2, 8, 8, 12, 3, 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, ws * ws, ws * ws)
    mask = None
    if with_mask:
        nw = (h // ws) * (w // ws)
        mask = np.where(
            rng.random((nw, ws * ws, ws * ws)) > 0.8, -100.0, 0.0
        ).astype(np.float32)
    extra = r(b, h, w, c) if with_extra else None
    scales = jnp.asarray([[1.25, 0.0], [1.0, 1.25]], jnp.float32)
    sc = (c // nh) ** -0.5

    def run(*leaves):
        xx = leaves[0]
        ws_ = leaves[1:13]
        bias_ = leaves[13]
        ex = leaves[14] if with_extra else None
        out = fb.fused_swin_block(
            xx, *ws_, bias_, ws, mask, sc, False,
            extra=ex, branch_scales=scales,
        )
        return jnp.sum(out * out)

    leaves = [x] + weights + [bias] + ([extra] if with_extra else [])
    argnums = tuple(range(len(leaves)))
    # the flag is read when the custom_vjp bwd is traced, i.e. inside
    # the jax.grad call — toggle it around each full grad computation
    fb.KERNEL_BACKWARD = True
    g_kern = jax.grad(run, argnums)(*leaves)
    fb.KERNEL_BACKWARD = False
    try:
        g_jnp = jax.grad(run, argnums)(*leaves)
    finally:
        fb.KERNEL_BACKWARD = True
    for i, (a, b_) in enumerate(zip(g_kern, g_jnp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3,
            err_msg=f"grad leaf {i}",
        )


@pytest.mark.parametrize(
    "variant", ["v3", "stackv", "exp2+stackv", "pair", "pair4",
                "pair+stackv", "exp2+pair4+stackv"]
)
@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_megakernel_matches_reference(rng, with_mask, variant):
    """fused_packed_windows_block (the ws=7 HAB path) matches the jnp
    packed reference, including window-count grouping and mask stream,
    for every packed-variant switch (stackv batched-head GEMMs, base-2
    softmax, block-diagonal window pairing)."""
    from tpu_superresolution_tpu.ops.pallas.fused_block import (
        _reference_packed,
        fused_packed_windows_block,
    )

    b, nwpad, n, c, nh = 2, 16, 16, 12, 3
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b * nwpad, n, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    mask = None
    if with_mask:
        mask = np.where(
            rng.random((nwpad, n, n)) > 0.8, -100.0, 0.0
        ).astype(np.float32)
    extra = r(b * nwpad, n, c)
    scales = jnp.asarray([[1.25, 0.0], [1.0, 1.25]], jnp.float32)
    sc = (c // nh) ** -0.5
    out = fused_packed_windows_block(
        x, *weights, bias, mask, sc, False,
        extra=extra, branch_scales=scales, variant=variant,
    )
    ref = _reference_packed(
        x, *weights, bias, scales, mask, sc, False, extra=extra
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("variant", ["v3", "stackv", "pair"])
def test_packed_qk_nopad_matches_reference(rng, variant):
    """PACKED_QK_NOPAD drops the q/k head-pad lanes from the packed
    qkv layout (v keeps its ones-column pad lane for the MXU row-sum);
    the dropped lanes are exact zeros in the score contraction so the
    output must match the padded layout's reference exactly."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, nwpad, n, c, nh = 2, 16, 16, 12, 3
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b * nwpad, n, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    mask = np.where(
        rng.random((nwpad, n, n)) > 0.8, -100.0, 0.0
    ).astype(np.float32)
    extra = r(b * nwpad, n, c)
    scales = jnp.asarray([[1.25, 0.0], [1.0, 1.25]], jnp.float32)
    sc = (c // nh) ** -0.5
    old = fb.PACKED_QK_NOPAD
    fb.PACKED_QK_NOPAD = True
    try:
        out = fb.fused_packed_windows_block(
            x, *weights, bias, mask, sc, False,
            extra=extra, branch_scales=scales, variant=variant,
        )
    finally:
        fb.PACKED_QK_NOPAD = old
    ref = fb._reference_packed(
        x, *weights, bias, scales, mask, sc, False, extra=extra
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_megakernel_backward_matches_jnp(rng):
    """Packed backward kernel grads == jnp vjp grads."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, nwpad, n, c, nh = 2, 8, 16, 12, 3
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b * nwpad, n, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    mask = np.where(
        rng.random((nwpad, n, n)) > 0.8, -100.0, 0.0
    ).astype(np.float32)
    extra = r(b * nwpad, n, c)
    scales = jnp.asarray([[1.0, 1.25], [1.25, 1.0]], jnp.float32)
    sc = (c // nh) ** -0.5

    def run(*leaves):
        out = fb.fused_packed_windows_block(
            leaves[0], *leaves[1:13], leaves[13], mask, sc, False,
            extra=leaves[14], branch_scales=scales,
        )
        return jnp.sum(out * out)

    leaves = [x] + weights + [bias, extra]
    argnums = tuple(range(len(leaves)))
    fb.KERNEL_BACKWARD = True
    g_kern = jax.grad(run, argnums)(*leaves)
    fb.KERNEL_BACKWARD = False
    try:
        g_jnp = jax.grad(run, argnums)(*leaves)
    finally:
        fb.KERNEL_BACKWARD = True
    for i, (a, b_) in enumerate(zip(g_kern, g_jnp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3,
            err_msg=f"grad leaf {i}",
        )


def test_hat_packed_path_matches_module(rng):
    """The packed-window HAB path (any geometry the strip megakernel
    can't tile, e.g. ws=7 in production or ws=4 here) must match the
    jnp module path on the full HAT forward."""
    from tpu_superresolution_tpu.core.config import HATConfig, build_model

    def cfg(impl):
        return HATConfig(
            scale=2, img_size=16, window_size=4, embed_dim=12,
            depths=(2, 2), num_heads=(2, 2), overlap_ratio=0.5,
            compress_ratio=3, squeeze_factor=4, mlp_ratio=2.0,
            attention_impl=impl, drop_path_rate=0.0,
            gelu_approximate=False, fused_reconstruct=False,
        )

    x = jnp.asarray(rng.random((1, 20, 16, 3), dtype=np.float32))
    m1 = build_model(cfg("jnp"))
    m2 = build_model(cfg("fused"))
    v = m1.init(jax.random.key(0), x, train=False)
    y1 = m1.apply(v, x, train=False)
    # ws=4 fails megakernel_tpu_ok (4 % 8 != 0, multi-column), so the
    # fused impl routes HAB through the packed-window megakernel
    y2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


def test_dat_spatial_attention_kernel_matches_jnp(rng):
    """DAT's rectangular-window spatial attention through the packed
    Pallas kernel (attention_impl='pallas', interpret on CPU) matches
    the jnp einsum path — incl. the dual-rect shift masks."""
    from tpu_superresolution_tpu.core.config import DATConfig, build_model

    def cfg(impl):
        return DATConfig(
            scale=2, img_size=16, embed_dim=24, split_size=(2, 4),
            depths=(4,), num_heads=(2,), expansion_factor=2.0,
            attention_impl=impl, drop_path_rate=0.0,
            fused_reconstruct=False,
        )

    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    m1 = build_model(cfg("jnp"))
    m2 = build_model(cfg("pallas"))
    v = m1.init(jax.random.key(0), x, train=False)
    y1 = m1.apply(v, x, train=False)
    y2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)


@pytest.mark.parametrize("b", [4, 3])
@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_extra", [False, True])
def test_megakernel_sample_fold_matches_reference(rng, b, with_mask, with_extra):
    """Inference sample folding (branch_scales=None: consecutive sample
    pairs stack vertically into one strip via a free reshape, doubling
    T) is a pure layout change — the output must match the jnp
    reference, mask and extra included."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    h, w, c, nh, ws = 16, 16, 12, 3, 4  # nwh=4, n=16 -> fold engages
    # b=3 exercises the odd-batch zero-sample padding path (production
    # only pads at b>=FOLD_ODD_MIN_B; lowered here to keep interpret
    # mode fast)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, ws * ws, ws * ws)
    mask = None
    if with_mask:
        nw = (h // ws) * (w // ws)
        mask = np.where(
            rng.random((nw, ws * ws, ws * ws)) > 0.8, -100.0, 0.0
        ).astype(np.float32)
    extra = r(b, h, w, c) if with_extra else None
    sc = (c // nh) ** -0.5

    orig_min_b = fb.FOLD_ODD_MIN_B
    if b % 2:
        fb.FOLD_ODD_MIN_B = 3
    # the fold predicate must actually engage for this geometry
    nwh, n = h // ws, ws * ws
    try:
        assert (b % 2 == 0 or b >= fb.FOLD_ODD_MIN_B) and nwh * n <= 512 \
            and 2 * nwh <= 16 and 2 * nwh * n <= 1024

        out = fb.fused_swin_block(
            x, *weights, bias, ws, mask, sc, False, extra=extra,
            branch_scales=None,
        )
        ones = jnp.ones((b, 2), jnp.float32)
        ref = fb._reference_block(
            x, *weights, bias, ones, ws, mask, sc, False, extra=extra
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )

        # folded vs unfolded kernel outputs agree too (direct check)
        unfolded = fb._mega_forward(
            x, *weights, bias, ones, ws, mask, sc, False, True,
            extra=extra, allow_fold=False,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(unfolded), atol=2e-5
        )
    finally:
        fb.FOLD_ODD_MIN_B = orig_min_b


@pytest.mark.parametrize("with_mask", [False, True])
def test_megakernel_sample_fold_odd_split(rng, with_mask):
    """Odd batch below FOLD_ODD_MIN_B: the kernel splits off the last
    sample and folds the even remainder (two pallas_calls) instead of
    padding — output must still match the jnp reference exactly."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 5, 16, 16, 12, 3, 4  # odd, default MIN_B=48
    assert 3 <= b < fb.FOLD_ODD_MIN_B
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, ws * ws, ws * ws)
    mask = None
    if with_mask:
        nw = (h // ws) * (w // ws)
        mask = np.where(
            rng.random((nw, ws * ws, ws * ws)) > 0.8, -100.0, 0.0
        ).astype(np.float32)
    extra = r(b, h, w, c)
    sc = (c // nh) ** -0.5

    out = fb.fused_swin_block(
        x, *weights, bias, ws, mask, sc, False, extra=extra,
        branch_scales=None,
    )
    ones = jnp.ones((b, 2), jnp.float32)
    ref = fb._reference_block(
        x, *weights, bias, ones, ws, mask, sc, False, extra=extra
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_megakernel_sample_fold_grads(rng):
    """branch_scales=None under jax.grad: the folded forward pairs with
    the (unfolded) backward — grads must match the jnp reference."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 2, 8, 8, 12, 3, 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, ws * ws, ws * ws)
    sc = (c // nh) ** -0.5

    def run(xx):
        out = fb.fused_swin_block(
            xx, *weights, bias, ws, None, sc, False, branch_scales=None,
        )
        return jnp.sum(out * out)

    def run_ref(xx):
        ones = jnp.ones((b, 2), jnp.float32)
        out = fb._reference_block(
            xx, *weights, bias, ones, ws, None, sc, False
        )
        return jnp.sum(out * out)

    g = jax.grad(run)(x)
    g_ref = jax.grad(run_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("variant", ["v3", "stackv", "pair", "exp2+pair+stackv"])
@pytest.mark.parametrize("with_mask,with_extra", [(False, False), (True, True)])
def test_spatial_megakernel_matches_reference(rng, with_mask, with_extra,
                                              variant):
    """fused_spatial_windows_block (window-row blocks straight off the
    spatial array, no XLA partition/pad) matches partition -> packed
    reference -> reverse, for every variant switch."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 2, 12, 12, 12, 3, 3
    n = ws * ws
    nW = (h // ws) * (w // ws)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    mask = None
    if with_mask:
        mask = np.where(
            rng.random((nW, n, n)) > 0.8, -100.0, 0.0
        ).astype(np.float32)
    extra = r(b, h, w, c) if with_extra else None
    scales = jnp.ones((b, 2), jnp.float32)
    sc = (c // nh) ** -0.5

    out = fb.fused_spatial_windows_block(
        x, *weights, bias, ws, mask, sc, False,
        extra=extra, branch_scales=scales, variant=variant,
    )
    ref = fb._reference_spatial(
        x, *weights, bias, scales, ws, mask, sc, False, extra=extra
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5
    )


@pytest.mark.parametrize("with_extra", [False, True])
def test_spatial_megakernel_grads(rng, with_extra):
    """Spatial-forward + packed-Pallas-backward custom_vjp matches the
    jnp vjp of the reference composition."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 1, 12, 12, 12, 3, 3
    n = ws * ws
    nW = (h // ws) * (w // ws)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    mask = np.where(
        rng.random((nW, n, n)) > 0.8, -100.0, 0.0
    ).astype(np.float32)
    extra = r(b, h, w, c) if with_extra else None
    scales = jnp.ones((b, 2), jnp.float32)
    sc = (c // nh) ** -0.5

    def loss_k(x, *weights):
        out = fb.fused_spatial_windows_block(
            x, *weights[:12], weights[12], ws, mask, sc, False,
            extra=extra, branch_scales=scales,
        )
        return jnp.sum(out ** 2)

    def loss_r(x, *weights):
        out = fb._reference_spatial(
            x, *weights[:12], weights[12], scales, ws, mask, sc, False,
            extra=extra,
        )
        return jnp.sum(out ** 2)

    argn = tuple(range(14))
    gk = jax.grad(loss_k, argnums=argn)(x, *weights, bias)
    gr = jax.grad(loss_r, argnums=argn)(x, *weights, bias)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4
        )


def test_hat_spatial_packed_toggle(rng):
    """HAT forward with SPATIAL_PACKED on matches the classic packed
    path exactly (same params, same input)."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb
    from tpu_superresolution_tpu.core.config import HATConfig, build_model

    cfg = HATConfig(
        scale=2, embed_dim=12, depths=(2,), num_heads=(3,),
        window_size=7, num_feat=8, compress_ratio=3, squeeze_factor=4,
        overlap_ratio=0.5, mlp_ratio=2.0, attention_impl="fused",
    )
    model = build_model(cfg)
    x = jnp.asarray(rng.random((1, 21, 21, 3)), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)
    y_classic = model.apply(v, x, train=False)
    orig = fb.SPATIAL_PACKED
    try:
        fb.SPATIAL_PACKED = True
        y_spatial = model.apply(v, x, train=False)
    finally:
        fb.SPATIAL_PACKED = orig
    np.testing.assert_allclose(
        np.asarray(y_spatial), np.asarray(y_classic), atol=3e-5
    )


def test_spatial_megakernel_vjp_fallback(rng):
    """KERNEL_BACKWARD=False routes the spatial block's backward through
    jax.vjp of the reference composition (debug/ablation fallback)."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 1, 6, 6, 6, 2, 3
    n = ws * ws
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    scales = jnp.ones((b, 2), jnp.float32)
    sc = (c // nh) ** -0.5

    def loss(kernel_backward):
        orig = fb.KERNEL_BACKWARD
        fb.KERNEL_BACKWARD = kernel_backward
        try:
            def f(x):
                out = fb.fused_spatial_windows_block(
                    x, *weights, bias, ws, None, sc, False,
                    branch_scales=scales,
                )
                return jnp.sum(out ** 2)
            return jax.grad(f)(x)
        finally:
            fb.KERNEL_BACKWARD = orig

    g_kernel = loss(True)
    g_vjp = loss(False)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_vjp), atol=2e-4
    )


def test_spatial_megakernel_branch_scales(rng):
    """Per-sample drop-path scales reach the spatial kernel via SMEM and
    match the reference (checks the (B, nwh)-grid sample indexing)."""
    import tpu_superresolution_tpu.ops.pallas.fused_block as fb

    b, h, w, c, nh, ws = 3, 6, 6, 6, 2, 3
    n = ws * ws
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x = r(b, h, w, c)
    weights = [r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c),
               r(c), r(c), r(c, 2 * c), r(2 * c), r(2 * c, c), r(c)]
    bias = r(nh, n, n)
    extra = r(b, h, w, c)
    scales = jnp.asarray([[0.0, 2.0], [2.0, 0.0], [1.0, 1.0]], jnp.float32)
    sc = (c // nh) ** -0.5

    out = fb.fused_spatial_windows_block(
        x, *weights, bias, ws, None, sc, False,
        extra=extra, branch_scales=scales,
    )
    ref = fb._reference_spatial(
        x, *weights, bias, scales, ws, None, sc, False, extra=extra
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


class TestFusedCAB:
    """ops/pallas/cab_conv.py: LN -> conv3x3 -> exact gelu -> conv3x3
    fused with row-halo chunking."""

    @pytest.mark.parametrize("h,w,rows", [(12, 12, 4), (13, 9, 4), (6, 8, 8)])
    def test_matches_reference(self, rng, h, w, rows):
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc

        b, cin, cm = 2, 12, 4
        r = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.2)
        x = r(b, h, w, cin)
        g, bb = r(cin) + 1.0, r(cin)
        k1, c1 = r(3, 3, cin, cm), r(cm)
        k2, c2 = r(3, 3, cm, cin), r(cin)
        orig = cc.CHUNK_ROWS
        try:
            cc.CHUNK_ROWS = rows
            out = cc.fused_ln_cab_convs(x, g, bb, k1, c1, k2, c2)
        finally:
            cc.CHUNK_ROWS = orig
        ref = cc._reference(x, g, bb, k1, c1, k2, c2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )

    def test_grads_match_reference(self, rng):
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc

        b, h, w, cin, cm = 1, 8, 8, 6, 2
        r = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.2)
        args = (r(b, h, w, cin), r(cin) + 1.0, r(cin),
                r(3, 3, cin, cm), r(cm), r(3, 3, cm, cin), r(cin))

        gk = jax.grad(
            lambda *a: jnp.sum(cc.fused_ln_cab_convs(*a) ** 2),
            argnums=tuple(range(7)))(*args)
        gr = jax.grad(
            lambda *a: jnp.sum(cc._reference(*a) ** 2),
            argnums=tuple(range(7)))(*args)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4
            )

    def test_hat_fused_cab_toggle(self, rng):
        """Whole HAT with cab_conv.ENABLE on matches the unfused path
        (same params; exercises HAB's pre-norm CAB call)."""
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
        from tpu_superresolution_tpu.core.config import HATConfig, build_model

        cfg = HATConfig(
            scale=2, embed_dim=12, depths=(2,), num_heads=(3,),
            window_size=4, num_feat=8, compress_ratio=3, squeeze_factor=4,
            overlap_ratio=0.5, mlp_ratio=2.0, attention_impl="fused",
        )
        model = build_model(cfg)
        x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        v = model.init(jax.random.key(0), x, train=False)
        y_off = model.apply(v, x, train=False)
        orig = cc.ENABLE
        try:
            cc.ENABLE = True
            y_on = model.apply(v, x, train=False)
        finally:
            cc.ENABLE = orig
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), atol=3e-5
        )

"""Round-3 additions: torch-checkpoint architecture inference, the
--exact evaluation mode, clear CLI errors, FLOP estimators, the ablation
harness, batched-attention grads, and the scale=1 reconstruction path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.util_torchref import import_reference

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.interop import (
    convert_swinir,
    extract_state_dict,
    infer_config,
)


def _nondefault_swinir_sd(scale=2, embed_dim=30, depths=(2, 3), heads=(3, 5),
                          window_size=4, upsampler="pixelshuffle"):
    ref = import_reference("network_swinir")
    torch.manual_seed(0)
    tmodel = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3,
        embed_dim=embed_dim, depths=list(depths), num_heads=list(heads),
        window_size=window_size, mlp_ratio=2.0, upscale=scale,
        img_range=1.0, upsampler=upsampler, resi_connection="1conv",
        drop_path_rate=0.0,
    )
    tmodel.eval()
    return tmodel, extract_state_dict(tmodel.state_dict())


class TestInferConfig:
    def test_swinir_nondefault_width_inferred(self):
        """A non-default-width checkpoint evaluates instead of failing
        deep in the converter (VERDICT round-2 item 10)."""
        tmodel, sd = _nondefault_swinir_sd()
        cfg = infer_config("swinir", sd, scale=2)
        assert cfg.embed_dim == 30
        assert cfg.depths == (2, 3)
        assert cfg.num_heads == (3, 5)
        assert cfg.window_size == 4
        assert cfg.upsampler == "pixelshuffle"
        assert cfg.mlp_ratio == 2.0
        # and the inferred config actually runs the converted weights
        cfg = dataclasses.replace(
            cfg, gelu_approximate=False, fused_reconstruct=False
        )
        model = build_model(cfg)
        variables = convert_swinir(sd, scale=2)
        x = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)
        ours = np.asarray(model.apply(variables, x, train=False))
        with torch.no_grad():
            refv = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        refv = np.transpose(refv.numpy(), (0, 2, 3, 1))
        assert np.max(np.abs(ours - refv)) < 3e-5

    def test_wrong_model_clear_error(self):
        _, sd = _nondefault_swinir_sd()
        with pytest.raises(ValueError, match="not a HAT checkpoint"):
            infer_config("hat", sd, scale=2)
        with pytest.raises(ValueError, match="not a DAT checkpoint"):
            infer_config("dat", sd, scale=2)
        with pytest.raises(ValueError, match="not an MS_ResUNet"):
            infer_config("ms_resunet", sd, scale=2)

    def test_pixelshuffledirect_inferred(self):
        _, sd = _nondefault_swinir_sd(upsampler="pixelshuffledirect")
        cfg = infer_config("swinir", sd, scale=2)
        assert cfg.upsampler == "pixelshuffledirect"
        assert cfg.out_channels == 3


class TestEvaluateExactMode:
    def test_torch_ckpt_defaults_exact(self, tmp_path):
        """Torch checkpoints evaluate with reference-exact semantics by
        default (ADVICE round-2: no fused border ring / tanh gelu in
        published-checkpoint metrics)."""
        from tpu_superresolution_tpu.cli.evaluate import _load_torch_checkpoint

        tmodel, _ = _nondefault_swinir_sd()
        path = tmp_path / "best.pt"
        torch.save({"params": tmodel.state_dict()}, path)
        mcfg, variables = _load_torch_checkpoint("swinir", str(path), 2, exact=True)
        assert mcfg.fused_reconstruct is False
        assert mcfg.gelu_approximate is False
        mcfg2, _ = _load_torch_checkpoint("swinir", str(path), 2, exact=False)
        assert mcfg2.fused_reconstruct is True


class TestTrainCliFlagGuards:
    def test_transformer_flags_rejected_for_cnn(self, tmp_path):
        from tpu_superresolution_tpu.cli.train import main

        with pytest.raises(SystemExit, match="embed_dim"):
            main([
                "--data_root", str(tmp_path), "--scale", "X2",
                "--model", "ms_resunet", "--embed_dim", "64",
            ])


class TestScale1Reconstruction:
    def test_swinir_scale1_fused_config_builds(self):
        """scale=1 short-circuits the fused composition (which would
        index an empty stage list) to the plain conv_last path."""
        cfg = SwinIRConfig(
            scale=1, img_size=8, window_size=4, embed_dim=16,
            depths=(1,), num_heads=(2,), upsampler="pixelshuffle",
            fused_reconstruct=True,
        )
        model = build_model(cfg)
        x = jnp.zeros((1, 8, 8, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 8, 8, 3)


class TestFlops:
    def test_swinir_analytic_matches_xla(self):
        from tpu_superresolution_tpu.utils.flops import swinir_flops, xla_flops

        cfg = SwinIRConfig(
            scale=2, img_size=16, window_size=4, embed_dim=32,
            depths=(2, 2), num_heads=(4, 4), upsampler="pixelshuffle",
            fused_reconstruct=False, drop_path_rate=0.0,
        )
        model = build_model(cfg)
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, train=False)
        measured = xla_flops(
            lambda v, a: model.apply(v, a, train=False), variables, x
        )
        analytic = swinir_flops(cfg, 16, 16)
        # cost_analysis counts every op incl. LN/softmax; analytic only
        # the GEMM/conv terms — agree within 25%
        assert measured > 0
        assert abs(analytic - measured) / measured < 0.25

    def test_mfu(self):
        from tpu_superresolution_tpu.utils.flops import mfu

        assert mfu(197e12, 1.0) == pytest.approx(1.0)

    def test_transformer_estimators_positive(self):
        from tpu_superresolution_tpu.core.config import DATConfig, HATConfig
        from tpu_superresolution_tpu.utils.flops import model_flops

        assert model_flops(SwinIRConfig(scale=4), 64, 64) > 1e9
        assert model_flops(HATConfig(scale=4), 64, 64) > 1e9
        assert model_flops(DATConfig(scale=4), 64, 64) > 1e9

    def test_cnn_dispatch_raises(self):
        from tpu_superresolution_tpu.core.config import MSResUNetConfig
        from tpu_superresolution_tpu.utils.flops import model_flops

        with pytest.raises(ValueError, match="xla_flops"):
            model_flops(MSResUNetConfig(), 64, 64)


class TestAblate:
    def test_interleaved_rounds(self):
        from tpu_superresolution_tpu.utils.ablate import ablate, report

        x = jnp.ones((64, 64), jnp.float32)
        res = ablate(
            {"mat": lambda: x @ x, "add": lambda: x + x},
            inner=3, rounds=3,
        )
        assert set(res) == {"mat", "add"}
        for r in res.values():
            assert len(r.times_s) == 3
            assert r.min_s > 0
        table = report(res)
        assert "vs best" in table and "mat" in table

    def test_carry_dependent_thunks(self):
        """Thunks taking one argument receive the fp32 carry so
        pure-HLO candidates can defeat loop-invariant code motion
        (round-3 finding: argless conv/gelu thunks were hoisted out of
        the fori_loop and every candidate timed as pure dispatch)."""
        from tpu_superresolution_tpu.utils.ablate import ablate

        x = jnp.ones((32, 32), jnp.float32)
        res = ablate(
            {
                "dep": lambda s: (x + (s * 1e-30).astype(x.dtype)) @ x,
                "argless": lambda: x @ x,
            },
            inner=3, rounds=2,
        )
        assert all(r.min_s > 0 for r in res.values())


class TestBatchedAttentionGrad:
    def test_batched_window_attention_differentiable(self, rng):
        """DATConfig(attention_impl='pallas') under jax.grad works
        (ADVICE round-2: custom_vjp falls back to the jnp reference)."""
        from tpu_superresolution_tpu.ops.pallas.window_attention import (
            batched_window_attention,
            window_attention_reference,
        )

        q = jnp.asarray(rng.standard_normal((8, 2, 16, 8), np.float32))
        k = jnp.asarray(rng.standard_normal((8, 2, 16, 8), np.float32))
        v = jnp.asarray(rng.standard_normal((8, 2, 16, 8), np.float32))
        bias = jnp.asarray(rng.standard_normal((2, 16, 16), np.float32))

        def loss_kernel(q, k, v, bias):
            return jnp.sum(
                batched_window_attention(q, k, v, bias, scale=0.5,
                                         interpret=True) ** 2
            )

        def loss_ref(q, k, v, bias):
            return jnp.sum(
                window_attention_reference(q, k, v, bias, scale=0.5) ** 2
            )

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g_k, g_r):
            assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 1e-4


class TestCompareCli:
    def test_side_by_side_report(self, tmp_path):
        """cli.compare rebuilds the lost report_creator.ipynb capability
        (.MISSING_LARGE_BLOBS:1-13): labeled [LR|bicubic|A|B|HR] panels
        + per-model metrics."""
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from util_fakedata import make_deeprock_dataset

        from tpu_superresolution_tpu.cli.compare import main

        root = make_deeprock_dataset(tmp_path, n_per_split=2, hr_size=32,
                                     scale="X2")
        tmodel, _sd = _nondefault_swinir_sd(
            scale=2, embed_dim=24, depths=(2,), heads=(2,), window_size=4,
            upsampler="pixelshuffledirect",
        )
        pt = tmp_path / "m.pt"
        torch.save(tmodel.state_dict(), pt)
        out = tmp_path / "report"
        main(["--data_root", str(root), "--scale", "X2",
              "--ckpt_a", str(pt), "--model_a", "swinir", "--name_a", "A",
              "--ckpt_b", str(pt), "--model_b", "swinir", "--name_b", "B",
              "--indices", "1", "--out_dir", str(out)])
        files = sorted(p.name for p in out.iterdir())
        assert files == ["A_vs_B_x2_test_0001.png"]


class TestConvGemm:
    """The 9-shifted-GEMM conv3x3 (ops/conv_gemm.py) that replaces the
    pathological in-model XLA conv op in HAT's CAB (PARITY.md round 3)."""

    def test_matches_conv_op_fp32(self):
        from tpu_superresolution_tpu.ops.conv_gemm import conv3x3_gemm

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 9, 11, 7)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 7, 5)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(5), jnp.float32)
        got = conv3x3_gemm(x, k, b)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_cab_impls_share_params_and_match(self):
        from tpu_superresolution_tpu.models.hat import CAB

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 12)), jnp.float32)
        gemm = CAB(compress_ratio=3, squeeze_factor=4)
        params = gemm.init(jax.random.PRNGKey(0), x)
        xla = CAB(compress_ratio=3, squeeze_factor=4, conv_impl="xla")
        # same param tree: xla impl applies with the gemm-initialised tree
        y_g = gemm.apply(params, x)
        y_x = xla.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_x),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_conv_op(self):
        from tpu_superresolution_tpu.ops.conv_gemm import conv3x3_gemm

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 3)) * 0.2, jnp.float32)

        def loss_g(x, k):
            return jnp.sum(conv3x3_gemm(x, k) ** 2)

        def loss_r(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y ** 2)

        for a, b in zip(jax.grad(loss_g, (0, 1))(x, k),
                        jax.grad(loss_r, (0, 1))(x, k)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestConvHalo:
    """conv3x3_halo (ops/pallas/cab_conv.py): one-read Pallas conv with
    row-halo chunking, interchangeable with conv3x3_gemm / the conv op."""

    @pytest.mark.parametrize("h,w,rows", [(12, 11, 4), (13, 8, 4), (5, 8, 8)])
    def test_matches_conv_op(self, h, w, rows):
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, h, w, 7)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 7, 5)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(5), jnp.float32)
        orig = cc.CHUNK_ROWS
        try:
            cc.CHUNK_ROWS = rows
            got = cc.conv3x3_halo(x, k, b)
        finally:
            cc.CHUNK_ROWS = orig
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_grads(self):
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc
        from tpu_superresolution_tpu.ops.conv_gemm import conv3x3_gemm

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 3)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(3), jnp.float32)
        gk = jax.grad(lambda *a: jnp.sum(cc.conv3x3_halo(*a) ** 2),
                      argnums=(0, 1, 2))(x, k, b)
        gr = jax.grad(lambda *a: jnp.sum(conv3x3_gemm(*a) ** 2),
                      argnums=(0, 1, 2))(x, k, b)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)

    def test_grads_bwd_impl_xla(self):
        """cab_conv.BWD_IMPL='xla' routes the custom vjp through
        lax.conv's transposed-conv backward; grads must match the
        default gemm reference to fp32 accumulation noise."""
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 8, 6, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 3)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(3), jnp.float32)
        loss = lambda *a: jnp.sum(cc.conv3x3_halo(*a) ** 2)
        grads = {}
        orig = cc.BWD_IMPL
        try:
            for impl in ("gemm", "xla"):
                cc.BWD_IMPL = impl
                grads[impl] = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
        finally:
            cc.BWD_IMPL = orig
        for a, b_ in zip(grads["gemm"], grads["xla"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)

    def test_conv3x3_module_halo_impl(self):
        from tpu_superresolution_tpu.models.blocks import Conv3x3

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 9, 9, 6)), jnp.float32)
        m_h = Conv3x3(5, impl="halo")
        params = m_h.init(jax.random.PRNGKey(0), x)
        y_h = m_h.apply(params, x)
        y_x = Conv3x3(5, impl="xla").apply(params, x)
        np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_x),
                                   atol=1e-5, rtol=1e-5)


class TestDWConvHalo:
    @pytest.mark.parametrize("h,w,rows", [(12, 9, 4), (5, 8, 8)])
    def test_matches_conv_op(self, h, w, rows):
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc

        rng = np.random.default_rng(0)
        c = 6
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.3, jnp.float32)
        b = jnp.asarray(rng.standard_normal(c), jnp.float32)
        orig = cc.CHUNK_ROWS
        try:
            cc.CHUNK_ROWS = rows
            got = cc.dwconv3x3_halo(x, k, b)
        finally:
            cc.CHUNK_ROWS = orig
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_module_impls_match_and_grads(self):
        from tpu_superresolution_tpu.models.blocks import DWConv3x3

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 9, 9, 6)), jnp.float32)
        m_h = DWConv3x3(6, impl="halo")
        params = m_h.init(jax.random.PRNGKey(0), x)
        y_h = m_h.apply(params, x)
        y_x = DWConv3x3(6, impl="xla").apply(params, x)
        np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_x),
                                   atol=1e-5, rtol=1e-5)

        def loss(m):
            return lambda p: jnp.sum(m.apply(p, x) ** 2)

        gh = jax.grad(loss(m_h))(params)
        gx = jax.grad(loss(DWConv3x3(6, impl="xla")))(params)
        for a, b in zip(jax.tree.leaves(gh), jax.tree.leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestConvHaloGeneral:
    """conv_halo: arbitrary kernel sizes + asymmetric SAME padding (the
    composed reconstruction conv's geometry)."""

    @pytest.mark.parametrize("kh,kw,pad", [
        (5, 5, ((2, 2), (2, 2))),
        (5, 5, ((3, 1), (1, 3))),
        (3, 5, ((0, 2), (2, 2))),
    ])
    def test_matches_conv_op(self, kh, kw, pad):
        import tpu_superresolution_tpu.ops.pallas.cab_conv as cc

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 13, 10, 6)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((kh, kw, 6, 4)) * 0.2,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(4), jnp.float32)
        orig = cc.CHUNK_ROWS
        try:
            cc.CHUNK_ROWS = 4
            got = cc.conv_halo(x, k, b, pad)
        finally:
            cc.CHUNK_ROWS = orig
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_fused_reconstruct_halo_impl(self):
        """fused_pixelshuffle_reconstruct with CONV_IMPL='halo' matches
        the conv-op path bit-for-bit in fp32."""
        import tpu_superresolution_tpu.ops.fused_upsample as fu

        rng = np.random.default_rng(1)
        c, nf = 8, 8
        y = jnp.asarray(rng.standard_normal((1, 12, 12, c)), jnp.float32)
        stages = [
            (jnp.asarray(rng.standard_normal((3, 3, c, 4 * nf)) * 0.2,
                         jnp.float32),
             jnp.asarray(rng.standard_normal(4 * nf) * 0.1, jnp.float32), 2),
        ]
        last = (jnp.asarray(rng.standard_normal((3, 3, nf, 3)) * 0.2,
                            jnp.float32),
                jnp.asarray(rng.standard_normal(3) * 0.1, jnp.float32))
        ref = fu.fused_pixelshuffle_reconstruct(y, stages, last,
                                                dtype=jnp.float32)
        orig = fu.CONV_IMPL
        try:
            fu.CONV_IMPL = "halo"
            got = fu.fused_pixelshuffle_reconstruct(y, stages, last,
                                                    dtype=jnp.float32)
        finally:
            fu.CONV_IMPL = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_persistent_compile_cache_optin(tmp_path, monkeypatch, capsys):
    """TPU_SR_COMPILE_CACHE turns on jax's persistent compilation cache;
    unset leaves the config untouched."""
    import jax

    from tpu_superresolution_tpu.cli.common import (
        enable_persistent_compile_cache,
    )

    monkeypatch.delenv("TPU_SR_COMPILE_CACHE", raising=False)
    assert enable_persistent_compile_cache() is None

    cache = tmp_path / "xla_cache"
    monkeypatch.setenv("TPU_SR_COMPILE_CACHE", str(cache))
    assert enable_persistent_compile_cache() == str(cache)
    assert cache.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(cache)
    # populate: a fresh compile must land an entry in the directory
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).random((64, 64), np.float32))
    jax.jit(lambda a: jnp.cos(a) @ a)(x).block_until_ready()
    assert len(list(cache.iterdir())) >= 1
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

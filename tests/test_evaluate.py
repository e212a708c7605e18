"""Evaluation subsystem tests: tiling correctness, baseline, runner."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.util_fakedata import make_deeprock_dataset

from tpu_superresolution_tpu.core.config import EvalConfig
from tpu_superresolution_tpu.data import Loader, PairedIndex
from tpu_superresolution_tpu.evaluate.baseline import bicubic_baseline
from tpu_superresolution_tpu.evaluate.runner import (
    Evaluator,
    _save_decision,
    save_tensor_as_png,
)
from tpu_superresolution_tpu.evaluate.tiling import tile_grid, tiled_forward


# ---------------------------------------------------------------------------
# tiling
# ---------------------------------------------------------------------------


def test_tile_grid_cases():
    assert tile_grid(100, 100, 16) == (0,)
    assert tile_grid(64, 100, 16) == (0,)
    assert tile_grid(100, 48, 16) == (0, 32, 52)
    starts = tile_grid(500, 128, 32)
    assert starts[0] == 0 and starts[-1] == 500 - 128
    # every pixel covered
    covered = np.zeros(500, bool)
    for s in starts:
        covered[s : s + 128] = True
    assert covered.all()


def test_tile_grid_bad_overlap():
    with pytest.raises(ValueError):
        tile_grid(100, 16, 16)


def _shift_invariant_fn(scale):
    """A shift-invariant per-pixel upsampler: nearest repeat + nonlinearity.
    Tiling any shift-invariant local fn must reproduce the full forward."""

    def fn(x):
        y = jnp.repeat(jnp.repeat(x, scale, 1), scale, 2)
        return y * 2.0 + jnp.sin(y)

    return fn


@pytest.mark.parametrize("scale", [1, 2])
def test_tiled_forward_matches_direct(scale, rng):
    fn = _shift_invariant_fn(scale)
    x = jnp.asarray(rng.random((2, 50, 70, 1), dtype=np.float32))
    direct = fn(x)
    tiled = tiled_forward(fn, x, scale, tile=32, overlap=8)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct), atol=1e-6)
    assert tiled.shape == (2, 50 * scale, 70 * scale, 1)


def test_tiled_forward_whole_image_passthrough(rng):
    fn = _shift_invariant_fn(1)
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    out = tiled_forward(fn, x, 1, tile=64, overlap=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), atol=1e-7)


def test_tiled_forward_under_jit(rng):
    fn = _shift_invariant_fn(2)
    run = jax.jit(lambda x: tiled_forward(fn, x, 2, 32, 8))
    x = jnp.asarray(rng.random((1, 48, 48, 1), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(fn(x)), atol=1e-6)


# ---------------------------------------------------------------------------
# baseline + runner
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("deeprock_eval")
    make_deeprock_dataset(root, hr_size=64, scale="X2", n_per_split=6)
    return root


def test_tiled_forward_narrow_image_full_coverage(rng):
    """Short edge < tile <= long edge: the grids must use the CLAMPED
    tile or columns between tile-size-spaced starts get zero blend
    weight (regression: NaNs on a 64x400 panorama at tile 192)."""
    fn = _shift_invariant_fn(2)
    x = jnp.asarray(rng.random((1, 64, 400, 1), dtype=np.float32))
    out = tiled_forward(fn, x, 2, tile=192, overlap=16)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), atol=1e-5)


def test_tiled_forward_geometry_sweep(rng):
    """Property sweep: tiled == direct for a shift-invariant fn across
    odd geometries (narrow, tall, tile > both edges, tile == edge,
    overlap ~ tile, with and without max_tile_batch)."""
    fn = _shift_invariant_fn(2)
    cases = [
        (13, 200, 64, 16, None),   # very narrow
        (200, 13, 64, 16, 3),      # very tall + chunked tile batch
        (50, 50, 64, 8, None),     # tile > both edges (whole image)
        (64, 64, 64, 8, None),     # tile == edges
        (65, 64, 64, 8, 2),        # one edge barely over
        (40, 56, 16, 14, None),    # overlap close to tile
        (9, 9, 8, 4, None),        # tiny
    ]
    for h, w, tile, ov, mtb in cases:
        x = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
        out = tiled_forward(fn, x, 2, tile=tile, overlap=ov,
                            max_tile_batch=mtb)
        assert bool(jnp.isfinite(out).all()), (h, w, tile, ov, mtb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(fn(x)), atol=1e-5,
            err_msg=str((h, w, tile, ov, mtb)),
        )


def test_bicubic_baseline_reasonable(dataset):
    idx = PairedIndex(str(dataset), "test", "X2")
    loader = Loader(idx, 3)
    res = bicubic_baseline(loader, 2)
    assert res["n"] == 6
    # our fake LR is PIL-bicubic downscaled from HR: upscale should beat 20 dB
    assert res["psnr"] > 20.0
    assert 0.5 < res["ssim"] <= 1.0


def test_save_decision_rules():
    # first-N
    cfg = EvalConfig(save_n=3)
    assert [_save_decision(i, cfg) for i in range(5)] == [True, True, True, False, False]
    # every-Nth from start
    cfg = EvalConfig(save_every=2, save_start=1, save_n=0)
    assert [_save_decision(i, cfg) for i in range(6)] == [False, True, False, True, False, True]
    # explicit indices dominate
    cfg = EvalConfig(save_indices=(0, 4), save_every=2, save_n=3)
    assert [_save_decision(i, cfg) for i in range(5)] == [True, False, False, False, True]


def test_save_tensor_as_png(tmp_path, rng):
    from PIL import Image

    x = rng.random((16, 16, 1), dtype=np.float32)
    save_tensor_as_png(x, tmp_path / "a.png")
    back = np.asarray(Image.open(tmp_path / "a.png")).astype(np.float32) / 255.0
    assert back.shape == (16, 16)
    np.testing.assert_allclose(back, x[..., 0], atol=1 / 255.0 + 1e-6)
    # rescale branch on constant image -> zeros, no crash
    save_tensor_as_png(np.full((8, 8, 1), 0.7, np.float32), tmp_path / "b.png", True)


class _IdentityModel:
    """Pre-upscale-convention 'model': returns input (so SR == bicubic)."""

    def apply(self, variables, x, train=False):
        return x


def test_evaluator_end_to_end(dataset, tmp_path):
    idx = PairedIndex(str(dataset), "test", "X2")
    loader = Loader(idx, 3)
    ev = Evaluator(
        _IdentityModel(), {}, 2, "pre_upscale",
        EvalConfig(save_n=2), log=lambda s: None,
    )
    res = ev.run(loader, save_dir=str(tmp_path / "preds"))
    base = bicubic_baseline(Loader(idx, 3), 2)
    assert abs(res["psnr"] - base["psnr"]) < 1e-3  # identity == bicubic
    assert res["n"] == 6 and res["mpix_per_s"] > 0
    dumps = sorted(p.name for p in (tmp_path / "preds").iterdir())
    assert dumps == [
        "idx_000000_hr.png", "idx_000000_lr.png", "idx_000000_sr.png",
        "idx_000001_hr.png", "idx_000001_lr.png", "idx_000001_sr.png",
    ]


def test_evaluator_tiled(dataset):
    idx = PairedIndex(str(dataset), "test", "X2")
    loader = Loader(idx, 2)
    ev_whole = Evaluator(_IdentityModel(), {}, 2, "pre_upscale",
                         EvalConfig(), log=lambda s: None)
    ev_tiled = Evaluator(_IdentityModel(), {}, 2, "pre_upscale",
                         EvalConfig(tile_size=48, tile_overlap=8), log=lambda s: None)
    r1 = ev_whole.run(loader)
    r2 = ev_tiled.run(Loader(idx, 2))
    assert abs(r1["psnr"] - r2["psnr"]) < 1e-3


def test_evaluator_raises_on_nonfinite(dataset):
    class BadModel:
        def apply(self, variables, x, train=False):
            return x / 0.0

    idx = PairedIndex(str(dataset), "test", "X2")
    ev = Evaluator(BadModel(), {}, 2, "pre_upscale", EvalConfig(), log=lambda s: None)
    with pytest.raises(RuntimeError, match="Non-finite"):
        ev.run(Loader(idx, 2))


def test_sharded_tiled_matches_direct(rng):
    """8-device spatially-sharded tiled inference == single-device."""
    import jax
    from tpu_superresolution_tpu.evaluate.tiling import sharded_tiled_forward
    from tpu_superresolution_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    fn = _shift_invariant_fn(2)
    x = jnp.asarray(rng.random((1, 48, 64, 1), dtype=np.float32))
    direct = fn(x)
    sharded = jax.jit(
        lambda x: sharded_tiled_forward(fn, x, 2, 32, 8, mesh)
    )(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct), atol=1e-5)


def test_tiled_forward_overlap_ge_tile_raises(rng):
    """A user-supplied overlap >= tile is an error (stride-1 grid
    explosion otherwise); the clamp applies only when the tile itself
    was clamped by a short image edge."""
    fn = _shift_invariant_fn(2)
    x = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    with pytest.raises(ValueError, match="overlap"):
        tiled_forward(fn, x, 2, tile=16, overlap=16)
    from tpu_superresolution_tpu.evaluate.tiling import sharded_tiled_forward
    from tpu_superresolution_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="overlap"):
        sharded_tiled_forward(fn, x, 2, 16, 16, make_mesh(8))
    # edge-clamped tile still clamps the overlap instead of raising
    narrow = jnp.asarray(rng.random((1, 8, 64, 1), dtype=np.float32))
    out = tiled_forward(fn, narrow, 2, tile=16, overlap=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(narrow)), atol=1e-5)


def test_sharded_tiled_max_tile_batch_matches_unchunked(rng):
    """Per-chip tile-batch chunking in the sharded path == unchunked."""
    import jax
    from tpu_superresolution_tpu.evaluate.tiling import sharded_tiled_forward
    from tpu_superresolution_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    fn = _shift_invariant_fn(2)
    x = jnp.asarray(rng.random((1, 96, 96, 1), dtype=np.float32))
    unchunked = jax.jit(
        lambda x: sharded_tiled_forward(fn, x, 2, 32, 8, mesh)
    )(x)
    chunked = jax.jit(
        lambda x: sharded_tiled_forward(
            fn, x, 2, 32, 8, mesh, max_tile_batch=1
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(unchunked), atol=1e-5
    )


def test_sharded_tiled_model(rng):
    """Real Flax model through make_sharded_tiled_apply on the CPU mesh."""
    import jax
    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
    from tpu_superresolution_tpu.evaluate.tiling import (
        make_sharded_tiled_apply,
        make_tiled_apply,
    )
    from tpu_superresolution_tpu.parallel import make_mesh

    cfg = SwinIRConfig(
        scale=2, img_size=16, window_size=4, embed_dim=8, depths=(1,),
        num_heads=(2,), upsampler="pixelshuffledirect",
    )
    model = build_model(cfg)
    x = jnp.asarray(rng.random((1, 40, 40, 3), dtype=np.float32))
    variables = model.init(jax.random.key(0), x[:, :16, :16, :], train=False)
    mesh = make_mesh(8)
    run_sharded = make_sharded_tiled_apply(model, variables, 2, 16, 4, mesh)
    run_single = make_tiled_apply(model, variables, 2, 16, 4)
    np.testing.assert_allclose(
        np.asarray(run_sharded(x)), np.asarray(run_single(x)), atol=1e-5
    )


@pytest.mark.parametrize("mtb", [1, 3, 7, 100])
def test_tiled_forward_chunked_matches_unchunked(mtb, rng):
    """max_tile_batch (HBM-bounding chunked tile processing) must be
    numerically identical to the single-batch path for any chunk size,
    including ragged last chunks and mtb > n_tiles."""
    fn = _shift_invariant_fn(2)
    x = jnp.asarray(rng.random((2, 50, 70, 1), dtype=np.float32))
    full = tiled_forward(fn, x, 2, tile=32, overlap=8)
    chunked = tiled_forward(fn, x, 2, tile=32, overlap=8, max_tile_batch=mtb)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-6)


def test_tiled_forward_chunked_under_jit(rng):
    fn = _shift_invariant_fn(2)
    run = jax.jit(lambda x: tiled_forward(fn, x, 2, 32, 8, max_tile_batch=3))
    x = jnp.asarray(rng.random((1, 48, 48, 1), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(fn(x)), atol=1e-6)


# ---------------------------------------------------------------------------
# x8 geometric self-ensemble (EvalConfig.self_ensemble)
# ---------------------------------------------------------------------------


class _AnisoModel:
    """native_lr scale-1 'model' that is NOT dihedral-equivariant, so
    the ensemble output genuinely differs from the plain forward."""

    def apply(self, variables, x, train=False):
        return x * 1.5 + jnp.cumsum(x, axis=2) * 0.01


def test_self_ensemble_matches_manual_average(rng):
    """Ensemble forward == mean over the 8 dihedral variants of the
    plain forward, on a NON-square input (exercises the H/W-swapped
    branches and the inverse mapping)."""
    from tpu_superresolution_tpu.evaluate.runner import _geo, _geo_inv

    x = jnp.asarray(rng.random((2, 20, 28, 1), dtype=np.float32))
    plain = Evaluator(_AnisoModel(), {}, 1, "native_lr",
                      EvalConfig(), log=lambda s: None).forward_fn()
    ens = Evaluator(_AnisoModel(), {}, 1, "native_lr",
                    EvalConfig(self_ensemble=True), log=lambda s: None).forward_fn()
    manual = np.mean(
        [np.asarray(_geo_inv(plain(_geo(x, k, f)), k, f))
         for k in range(4) for f in (False, True)], axis=0)
    got = np.asarray(ens(x))
    assert not np.allclose(got, np.asarray(plain(x)), atol=1e-4)  # TTA does something
    np.testing.assert_allclose(got, manual, atol=1e-6)


def test_self_ensemble_equivariant_model_is_identity(rng):
    """For an exactly dihedral-equivariant fn (pixelwise on a nearest
    upsample), every variant inverse-maps to the same output — so the
    ensemble must equal the plain forward.  This pins the inverse
    transform: any misalignment would show up as a mismatch."""
    class _EquivModel:
        def apply(self, variables, x, train=False):
            y = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
            return y * 2.0 + jnp.sin(y)

    x = jnp.asarray(rng.random((1, 18, 26, 1), dtype=np.float32))
    plain = Evaluator(_EquivModel(), {}, 2, "native_lr",
                      EvalConfig(), log=lambda s: None).forward_fn()
    ens = Evaluator(_EquivModel(), {}, 2, "native_lr",
                    EvalConfig(self_ensemble=True), log=lambda s: None).forward_fn()
    np.testing.assert_allclose(
        np.asarray(ens(x)), np.asarray(plain(x)), atol=1e-5)


def test_self_ensemble_tiled_pre_upscale(dataset):
    """Full runner path with tiling + pre-upscale + identity model:
    bicubic pre-upscale commutes with the dihedral group (symmetric
    separable kernel), so ensemble PSNR == plain PSNR == bicubic."""
    idx = PairedIndex(str(dataset), "test", "X2")
    ev = Evaluator(
        _IdentityModel(), {}, 2, "pre_upscale",
        EvalConfig(tile_size=48, tile_overlap=8, self_ensemble=True),
        log=lambda s: None,
    )
    res = ev.run(Loader(idx, 2))
    base = bicubic_baseline(Loader(idx, 2), 2)
    assert abs(res["psnr"] - base["psnr"]) < 1e-3

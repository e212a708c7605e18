"""MS_ResUNet / UNet2D structural tests.

Mirrors the reference's manual checks: same-size forward geometry
(ms_resunet.py:195-259 — 5x5 p1 stem shrink compensated by 3x3 p2 head)
and the exact parameter count 24,918,369 (model_debug.ipynb cell 7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.core.config import MSResUNetConfig, UNet2DConfig, build_model


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def msresunet():
    cfg = MSResUNetConfig()
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_msresunet_param_count(msresunet):
    _, variables = msresunet
    assert _param_count(variables["params"]) == 24_918_369


def test_msresunet_same_size_forward(msresunet):
    model, variables = msresunet
    for h, w in [(64, 64), (56, 72)]:
        x = jnp.linspace(0, 1, h * w, dtype=jnp.float32).reshape(1, h, w, 1)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, h, w, 1)
        assert bool(jnp.isfinite(y).all())


def test_msresunet_train_mode_updates_batch_stats(msresunet):
    model, variables = msresunet
    x = jnp.ones((2, 32, 32, 1), jnp.float32) * 0.5
    y, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert y.shape == (2, 32, 32, 1)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_msresunet_jit_forward(msresunet):
    model, variables = msresunet
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    y = fwd(variables, x)
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("bilinear", [True, False])
def test_unet2d_shapes(bilinear):
    cfg = UNet2DConfig(base_channels=16, depth=3, bilinear=bilinear)
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 1)


def test_unet2d_residual_head():
    cfg = UNet2DConfig(base_channels=8, depth=2, residual=True)
    model = build_model(cfg)
    x = jnp.ones((1, 32, 32, 1), jnp.float32) * 0.25
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 1)

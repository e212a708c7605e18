"""Stochastic depth (drop-path) wiring tests for SwinIR / HAT / DAT.

The reference trains all three transformers with drop_path_rate=0.1 and
the linear decay rule (network_swinir.py:649,701; hat_arch.py:755,827;
dat_arch.py:733,771).  These tests prove:
  1. inference is unaffected by the rate (identity at eval),
  2. rate=0 training equals eval output (no hidden noise),
  3. the residual branch is ACTUALLY dropped in train mode — with the
     terminal block's rate at 1.0 (linspace endpoint), perturbing that
     block's MLP weights must not change the train-mode output while it
     must change the eval-mode output,
  4. different drop_path keys give different train-mode outputs
     (per-sample randomness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.core.config import (
    DATConfig,
    HATConfig,
    SwinIRConfig,
    build_model,
)


def _swinir(rate):
    return SwinIRConfig(
        scale=2, img_size=16, window_size=4, embed_dim=8, depths=(2,),
        num_heads=(2,), upsampler="pixelshuffledirect", attention_impl="jnp",
        drop_path_rate=rate,
    )


def _hat(rate):
    return HATConfig(
        scale=2, img_size=16, window_size=4, embed_dim=12, depths=(2,),
        num_heads=(2,), overlap_ratio=0.5, squeeze_factor=6,
        attention_impl="jnp", mlp_ratio=2.0, drop_path_rate=rate,
    )


def _dat(rate):
    return DATConfig(
        scale=2, img_size=16, embed_dim=32, split_size=(2, 4), depths=(2,),
        num_heads=(2,), expansion_factor=2.0,
        upsampler="pixelshuffledirect", drop_path_rate=rate,
    )


CASES = [
    ("swinir", _swinir),
    ("hat", _hat),
    ("dat", _dat),
]


def _fwd(m, v, x, train, key=None):
    """Forward handling DAT's BatchNorm (mutable batch_stats in train)."""
    kw = {"rngs": {"drop_path": key}} if key is not None else {}
    if train and "batch_stats" in v:
        out, _ = m.apply(v, x, train=True, mutable=["batch_stats"], **kw)
        return out
    return m.apply(v, x, train=train, **kw)


def _last_block_mlp_path(params, name):
    """Return (path tuple, kernel) for the terminal block's MLP/FFN fc1."""
    blk = params["layers_0"]["blocks_1"]
    sub = "mlp" if "mlp" in blk else "ffn"
    inner = "fc1" if "fc1" in blk[sub] else list(blk[sub].keys())[0]
    return ("layers_0", "blocks_1", sub, inner)


def _perturb(params, path, eps=0.5):
    import copy

    p = jax.tree.map(lambda a: a, params)  # shallow-copy tree
    node = p
    for k in path[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    leaf = dict(node[path[-1]])
    # NB: a uniform kernel shift would be nulled by the LayerNorm'd
    # (zero-mean) input — perturb the bias instead.
    leaf["bias"] = leaf["bias"] + eps
    node[path[-1]] = leaf
    return p


@pytest.mark.parametrize("name,cfg_fn", CASES)
def test_drop_path_identity_at_eval_and_rate0(name, cfg_fn, rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    m1 = build_model(cfg_fn(0.0))
    m2 = build_model(cfg_fn(0.5))
    v = m1.init(jax.random.key(0), x, train=False)
    # eval output independent of the configured rate
    y1 = m1.apply(v, x, train=False)
    y2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    # rate=0 training is key-independent (no hidden randomness)...
    yt = _fwd(m1, v, x, True, jax.random.key(1))
    yt2 = _fwd(m1, v, x, True, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yt2), atol=1e-6)
    if "batch_stats" not in v:
        # ...and equals eval (DAT exempt: BatchNorm train/eval stats differ)
        np.testing.assert_allclose(np.asarray(yt), np.asarray(y1), atol=1e-6)


@pytest.mark.parametrize("name,cfg_fn", CASES)
def test_terminal_branch_actually_dropped(name, cfg_fn, rng):
    """With drop_path_rate=1.0 the linspace endpoint makes the LAST
    block's residual branch always dropped: perturbing its MLP weights
    must leave train-mode output unchanged but change eval output."""
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    m = build_model(cfg_fn(1.0))
    v = m.init(jax.random.key(0), x, train=False)
    path = _last_block_mlp_path(v["params"], name)
    v2 = dict(v)  # keep batch_stats etc. (DAT has BN branches)
    v2["params"] = _perturb(v["params"], path)

    key = jax.random.key(7)
    yt1 = _fwd(m, v, x, True, key)
    yt2 = _fwd(m, v2, x, True, key)
    np.testing.assert_allclose(np.asarray(yt1), np.asarray(yt2), atol=1e-6)

    ye1 = _fwd(m, v, x, False)
    ye2 = _fwd(m, v2, x, False)
    assert float(jnp.abs(ye1 - ye2).max()) > 1e-4


@pytest.mark.parametrize("name,cfg_fn", CASES)
def test_drop_path_key_randomness(name, cfg_fn, rng):
    x = jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32))
    m = build_model(cfg_fn(0.9))
    v = m.init(jax.random.key(0), x, train=False)
    ya = _fwd(m, v, x, True, jax.random.key(1))
    yb = _fwd(m, v, x, True, jax.random.key(2))
    assert float(jnp.abs(ya - yb).max()) > 1e-5

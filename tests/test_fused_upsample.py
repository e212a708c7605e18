"""Fused (composed) pixel-shuffle reconstruction vs the step-by-step
chain (reference network_swinir.py:572-591,816-817).

The composed form is algebraically identical on the interior; the two
differ only on a thin border ring (<= reach*scale output pixels) where
the chain's per-stage zero-padding truncates virtual intermediate
values.  See ops/fused_upsample.py docstring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_superresolution_tpu.ops.fused_upsample import (
    chain_pixelshuffle_reconstruct,
    composed_upsample_params,
    fused_pixelshuffle_reconstruct,
)


def _rand(rng, *s):
    return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)


@pytest.mark.parametrize(
    "scale,rhos,ring",
    [(2, [2], 2), (4, [2, 2], 12), (3, [3], 3)],
)
def test_composed_matches_chain_interior(scale, rhos, ring):
    rng = np.random.RandomState(7)
    C = 64
    stages = [(_rand(rng, 3, 3, C, C * r * r), _rand(rng, C * r * r), r) for r in rhos]
    last = (_rand(rng, 3, 3, C, 3), _rand(rng, 3))
    y = _rand(rng, 2, 16, 16, C)
    out_f = fused_pixelshuffle_reconstruct(y, stages, last, dtype=jnp.float32)
    out_c = chain_pixelshuffle_reconstruct(y, stages, last, dtype=jnp.float32)
    K, B, pad, r = composed_upsample_params(stages, last)
    assert r == scale
    assert K.shape[:2] == (5, 5)  # structural support trims the formal 7x7
    assert out_f.shape == out_c.shape == (2, 16 * scale, 16 * scale, 3)
    d = np.abs(np.asarray(out_f) - np.asarray(out_c))
    assert d[:, ring:-ring, ring:-ring].max() < 2e-5


def test_swinir_fused_reconstruct_param_compatible():
    """fused_reconstruct=True/False produce identical param trees and
    identical interior outputs from the SAME params (checkpoints are
    interchangeable)."""
    from tpu_superresolution_tpu.core import build_model
    from tpu_superresolution_tpu.core.config import SwinIRConfig

    cfg = SwinIRConfig(
        img_size=16, window_size=4, embed_dim=60, depths=(2,), num_heads=(2,),
        scale=4, attention_impl="jnp", gelu_approximate=False,
        fused_reconstruct=True,
    )
    cfg0 = dataclasses.replace(cfg, fused_reconstruct=False)
    m1, m0 = build_model(cfg), build_model(cfg0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32))
    v1 = m1.init(jax.random.key(0), x, train=False)
    v0 = m0.init(jax.random.key(0), x, train=False)
    s1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v1)
    s0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v0)
    assert s1 == s0
    y1 = np.asarray(m1.apply(v0, x, train=False), np.float32)
    y0 = np.asarray(m0.apply(v0, x, train=False), np.float32)
    ring = 12  # 3 low-res px * scale 4
    assert np.abs(y1 - y0)[:, ring:-ring, ring:-ring].max() < 1e-5


def test_fused_reconstruct_grads_finite():
    """The composed path is differentiable (training can keep it on)."""
    rng = np.random.RandomState(3)
    C = 8
    stages = [(_rand(rng, 3, 3, C, C * 4), _rand(rng, C * 4), 2)]
    last = (_rand(rng, 3, 3, C, 3), _rand(rng, 3))
    y = _rand(rng, 1, 8, 8, C)

    w0, b0, _ = stages[0]

    def loss(y, w0, b0, last):
        out = fused_pixelshuffle_reconstruct(
            y, [(w0, b0, 2)], last, dtype=jnp.float32
        )
        return jnp.mean(out * out)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(y, w0, b0, last)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())


def test_converted_torch_weights_through_fused_reconstruct():
    """Official-format converted SwinIR weights run through the FUSED
    reconstruction (production default) and match the torch forward on
    the interior (border ring excluded)."""
    import torch

    from tests.util_torchref import import_reference
    from tpu_superresolution_tpu.core import build_model
    from tpu_superresolution_tpu.core.config import SwinIRConfig
    from tpu_superresolution_tpu.interop import convert_swinir, extract_state_dict

    ref = import_reference("network_swinir")
    tmodel = ref.SwinIR(
        upscale=2, in_chans=3, img_size=16, window_size=4,
        img_range=1.0, depths=(2,), embed_dim=12, num_heads=(2,),
        mlp_ratio=2.0, upsampler="pixelshuffle", resi_connection="1conv",
    )
    tmodel.eval()
    cfg = SwinIRConfig(
        scale=2, img_size=16, window_size=4, embed_dim=12, depths=(2,),
        num_heads=(2,), mlp_ratio=2.0, upsampler="pixelshuffle",
        attention_impl="jnp", gelu_approximate=False,
        fused_reconstruct=True,
    )
    jmodel = build_model(cfg)
    variables = convert_swinir(extract_state_dict(tmodel.state_dict()), scale=2)
    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    yj = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
    yj = yj.transpose(0, 3, 1, 2)
    ring = 4  # 2 low-res px * scale 2
    d = np.abs(yt - yj)[:, :, ring:-ring, ring:-ring]
    assert d.max() < 1e-4, d.max()

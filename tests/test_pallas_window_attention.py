"""Pallas fused window attention vs the jnp oracle (interpret mode on CPU;
the TPU-compiled path is exercised by bench.py / SwinIR forward on
hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_superresolution_tpu.ops.pallas.window_attention import (
    fused_window_attention,
    window_attention_reference,
)


def _inputs(rng, bw=8, nh=3, n=16, hd=8):
    q = jnp.asarray(rng.standard_normal((bw, nh, n, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, nh, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, nh, n, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)).astype(np.float32))
    return q, k, v, bias


def test_fused_matches_reference(rng):
    q, k, v, bias = _inputs(rng)
    scale = 8**-0.5
    ref = window_attention_reference(q, k, v, bias, None, scale)
    out = fused_window_attention(q, k, v, bias, None, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_matches_reference_masked(rng):
    q, k, v, bias = _inputs(rng)
    nwm = 4  # window w uses mask[w % 4]
    mask = jnp.asarray(
        (rng.random((nwm, 16, 16)) > 0.5).astype(np.float32) * -100.0
    )
    scale = 8**-0.5
    ref = window_attention_reference(q, k, v, bias, mask, scale)
    out = fused_window_attention(q, k, v, bias, mask, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_bf16(rng):
    q, k, v, bias = _inputs(rng)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ref = window_attention_reference(q, k, v, bias, None, 0.35)
    out = fused_window_attention(q, k, v, bias, None, scale=0.35, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )

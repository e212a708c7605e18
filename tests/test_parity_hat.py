"""Golden numerical parity: reference torch HAT vs our Flax port.

Uses ws=4, overlap_ratio=0.5 (ows=6, even diff -> torch Unfold tiles
correctly) on small configs; covers HAB conv branch + channel attention,
shifted windows, OCAB, and the rpi_oca negative-index wraparound quirk.
"""

import numpy as np
import pytest
import torch

from tests.util_torchref import import_reference

from tpu_superresolution_tpu.core.config import HATConfig, build_model
from tpu_superresolution_tpu.interop import extract_state_dict
from tpu_superresolution_tpu.interop.torch_convert import convert_hat


def _make_pair(scale=2, img_size=16, window_size=4, embed_dim=24,
               depths=(2, 2), num_heads=(4, 4), overlap_ratio=0.5,
               compress_ratio=3, squeeze_factor=6):
    ref = import_reference("hat_arch")
    torch.manual_seed(0)
    tmodel = ref.HAT(
        img_size=img_size,
        patch_size=1,
        in_chans=3,
        embed_dim=embed_dim,
        depths=list(depths),
        num_heads=list(num_heads),
        window_size=window_size,
        compress_ratio=compress_ratio,
        squeeze_factor=squeeze_factor,
        conv_scale=0.01,
        overlap_ratio=overlap_ratio,
        mlp_ratio=2.0,
        upscale=scale,
        img_range=1.0,
        upsampler="pixelshuffle",
        resi_connection="1conv",
        drop_path_rate=0.0,
    )
    tmodel.eval()

    cfg = HATConfig(
        scale=scale,
        img_size=img_size,
        window_size=window_size,
        embed_dim=embed_dim,
        depths=depths,
        num_heads=num_heads,
        overlap_ratio=overlap_ratio,
        compress_ratio=compress_ratio,
        squeeze_factor=squeeze_factor,
        mlp_ratio=2.0,
        fused_reconstruct=False,  # exact chain border semantics
        gelu_approximate=False,  # golden parity needs torch's exact erf
    )
    jmodel = build_model(cfg)
    variables = convert_hat(extract_state_dict(tmodel.state_dict()))
    return tmodel, jmodel, variables


def _compare(tmodel, jmodel, variables, x_nhwc, tol=3e-5):
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    ours = np.asarray(jmodel.apply(variables, x_nhwc, train=False))
    assert ours.shape == ref.shape, f"{ours.shape} vs {ref.shape}"
    diff = np.max(np.abs(ours - ref))
    assert diff < tol, f"max abs diff {diff:.3e}"


@pytest.mark.parametrize("scale", [2, 4])
def test_hat_parity(scale, rng):
    tmodel, jmodel, variables = _make_pair(scale=scale)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_hat_parity_nonmultiple_size(rng):
    """Reflect-pad path + per-trace masks + final crop."""
    tmodel, jmodel, variables = _make_pair(scale=2)
    x = rng.random((2, 14, 11, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_hat_parity_overlap_1(rng):
    """overlap_ratio=1.0 -> ows=2*ws (even diff), bigger kv windows."""
    tmodel, jmodel, variables = _make_pair(overlap_ratio=1.0)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)

"""Golden numerical parity: reference torch DAT vs our Flax port.

Covers the dual rect-window branches, the rg/block shift parity rule
(needs depth >= 3 in an even group and >= 1 in an odd group to hit
shifted blocks), dynamic position bias, XCiT channel attention with
temperature, AIM's crossed gating, SGFN, and per-attention padding for
non-multiple sizes.
"""

import numpy as np
import pytest
import torch

from tests.util_torchref import import_reference

from tpu_superresolution_tpu.core.config import DATConfig, build_model
from tpu_superresolution_tpu.interop import extract_state_dict
from tpu_superresolution_tpu.interop.torch_convert import convert_dat


def _make_pair(scale=2, img_size=16, embed_dim=32, depths=(4, 4),
               num_heads=(4, 4), split_size=(2, 4), expansion=2.0,
               upsampler="pixelshuffle"):
    ref = import_reference("dat_arch")
    torch.manual_seed(0)
    tmodel = ref.DAT(
        img_size=img_size,
        in_chans=3,
        embed_dim=embed_dim,
        split_size=list(split_size),
        depth=list(depths),
        num_heads=list(num_heads),
        expansion_factor=expansion,
        qkv_bias=True,
        upscale=scale,
        img_range=1.0,
        resi_connection="1conv",
        upsampler=upsampler,
        drop_path_rate=0.0,
    )
    tmodel.eval()

    cfg = DATConfig(
        scale=scale,
        img_size=img_size,
        embed_dim=embed_dim,
        split_size=split_size,
        depths=depths,
        num_heads=num_heads,
        expansion_factor=expansion,
        upsampler=upsampler,
        fused_reconstruct=False,  # exact chain border semantics
    )
    jmodel = build_model(cfg)
    variables = convert_dat(extract_state_dict(tmodel.state_dict()))
    return tmodel, jmodel, variables


def _compare(tmodel, jmodel, variables, x_nhwc, tol=3e-5):
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    ours = np.asarray(jmodel.apply(variables, x_nhwc, train=False))
    assert ours.shape == ref.shape, f"{ours.shape} vs {ref.shape}"
    diff = np.max(np.abs(ours - ref))
    assert diff < tol, f"max abs diff {diff:.3e}"


@pytest.mark.parametrize("scale,upsampler", [
    (2, "pixelshuffle"),
    (4, "pixelshuffle"),
    (2, "pixelshuffledirect"),
])
def test_dat_parity(scale, upsampler, rng):
    tmodel, jmodel, variables = _make_pair(scale=scale, upsampler=upsampler)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_dat_parity_nonmultiple_size(rng):
    """15x13 input: exercises per-attention padding (dat_arch.py:376-385)
    and masks computed at the padded size."""
    tmodel, jmodel, variables = _make_pair(scale=2)
    x = rng.random((2, 15, 13, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_dat_parity_square_split(rng):
    tmodel, jmodel, variables = _make_pair(split_size=(4, 4), depths=(3, 3))
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_dat_parity_production_shape(rng):
    """Production-style config scaled down: split (8,16) like the
    reference smoke test (dat_arch.py:862-883)."""
    tmodel, jmodel, variables = _make_pair(
        img_size=32, split_size=(8, 16), depths=(2, 2), embed_dim=32
    )
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)

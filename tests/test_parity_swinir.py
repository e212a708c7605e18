"""Golden numerical parity: reference torch SwinIR vs our Flax port.

Covers the shifted-window mask path, reflect-pad for non-multiple sizes,
both pixelshuffle reconstructions, and x2/x4 scales, on small configs.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.util_torchref import import_reference

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.interop import convert_swinir, extract_state_dict


def _make_pair(scale=2, upsampler="pixelshuffle", img_size=16, window_size=4,
               embed_dim=24, depths=(2, 2), num_heads=(4, 4), in_chans=3,
               resi_connection="1conv"):
    ref = import_reference("network_swinir")
    torch.manual_seed(0)
    tmodel = ref.SwinIR(
        img_size=img_size,
        patch_size=1,
        in_chans=in_chans,
        embed_dim=embed_dim,
        depths=list(depths),
        num_heads=list(num_heads),
        window_size=window_size,
        mlp_ratio=2.0,
        upscale=scale,
        img_range=1.0,
        upsampler=upsampler,
        resi_connection=resi_connection,
        drop_path_rate=0.0,
    )
    tmodel.eval()

    cfg = SwinIRConfig(
        scale=scale,
        in_channels=in_chans,
        out_channels=in_chans,
        img_size=img_size,
        window_size=window_size,
        embed_dim=embed_dim,
        depths=depths,
        num_heads=num_heads,
        mlp_ratio=2.0,
        upsampler=upsampler,
        resi_connection=resi_connection,
        gelu_approximate=False,  # golden parity needs torch's exact erf
        fused_reconstruct=False,  # exact chain border semantics
    )
    jmodel = build_model(cfg)
    variables = convert_swinir(extract_state_dict(tmodel.state_dict()), scale=scale)
    return tmodel, jmodel, variables


def _compare(tmodel, jmodel, variables, x_nhwc, tol=2e-5):
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
def test_swinir_parity(scale, upsampler, rng):
    tmodel, jmodel, variables = _make_pair(scale=scale, upsampler=upsampler)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_swinir_parity_nonmultiple_size(rng):
    """14x13 input: exercises reflect-pad (network_swinir.py:783-788),
    shift-mask at a non-init size, and the final crop to H*s, W*s."""
    tmodel, jmodel, variables = _make_pair(scale=2)
    x = rng.random((2, 14, 13, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_swinir_parity_3conv(rng):
    tmodel, jmodel, variables = _make_pair(resi_connection="3conv")
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_swinir_parity_grayscale(rng):
    tmodel, jmodel, variables = _make_pair(in_chans=1)
    x = rng.random((1, 16, 16, 1), dtype=np.float32)
    _compare(tmodel, jmodel, variables, x)


def test_tiled_inference_psnr_parity(rng):
    """Tiled overlap-blended inference vs the torch full-image forward on
    converted weights: seams alter attention context, so equality is at
    the PSNR level — the BASELINE budget is <=0.05 dB on trained models;
    on random weights we require the tiled/full outputs to agree to a
    high PSNR and the PSNR-vs-torch delta to be tiny."""
    import jax
    from tpu_superresolution_tpu.evaluate.tiling import make_tiled_apply
    from tpu_superresolution_tpu.ops.metrics import batch_psnr

    tmodel, jmodel, variables = _make_pair(scale=2, img_size=16, window_size=4)
    x = rng.random((1, 40, 40, 3), dtype=np.float32)

    with torch.no_grad():
        full = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    full = np.clip(np.transpose(full.numpy(), (0, 2, 3, 1)), 0, 1)

    run = make_tiled_apply(jmodel, variables, 2, tile=16, overlap=8)
    tiled = np.clip(np.asarray(run(jnp.asarray(x))), 0, 1)

    # Random weights maximize seam sensitivity (no smoothness prior);
    # trained SR models sit far higher.  Exact full-image parity vs
    # torch is covered by the other tests in this file.
    psnr_tiled_vs_full = float(batch_psnr(tiled, full)[0])
    assert psnr_tiled_vs_full > 30.0, psnr_tiled_vs_full

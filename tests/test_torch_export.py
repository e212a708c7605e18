"""Flax -> torch export round trips (interop/torch_export.py): every
weight the converters consume comes back BIT-EXACTLY, the only keys
missing from the export are the reference's derived buffers (masks /
relative-position indices, rebuilt by the torch module at init), and a
fresh reference model loaded from the export reproduces the original
model's forward exactly."""

import re

import numpy as np
import pytest
import torch

from tests.util_torchref import import_reference

from tpu_superresolution_tpu.interop import (
    convert_dat,
    convert_hat,
    convert_msresunet,
    convert_swinir,
    extract_state_dict,
)
from tpu_superresolution_tpu.interop.torch_export import (
    export_state_dict,
    save_torch_checkpoint,
)

# Derived buffers the converters intentionally skip (rebuilt from config
# by the torch modules at construction).
_BUFFER_RE = re.compile(
    r"(attn_mask|relative_position_index|rpe_biases|rpi_sa|rpi_oca|"
    r"attn_mask_0|attn_mask_1)"
)


def _roundtrip(model_name, tmodel, convert, **convert_kw):
    sd0 = extract_state_dict(tmodel.state_dict())
    variables = convert(sd0, **convert_kw)
    out = export_state_dict(model_name, variables)

    missing = set(sd0) - set(out)
    unexpected = set(out) - set(sd0)
    assert not unexpected, sorted(unexpected)[:8]
    leftover = [k for k in missing if not _BUFFER_RE.search(k)]
    assert not leftover, sorted(leftover)[:8]

    for k, v in out.items():
        np.testing.assert_array_equal(
            v, sd0[k], err_msg=f"round-trip mismatch at {k}"
        )
    return out


def _forward_equal(tmodel, make_fresh, out, x):
    fresh = make_fresh()
    res = fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()},
        strict=False,
    )
    assert not res.unexpected_keys, res.unexpected_keys
    assert all(_BUFFER_RE.search(k) or "num_batches_tracked" in k
               for k in res.missing_keys), res.missing_keys
    fresh.eval()
    with torch.no_grad():
        a = tmodel(x).numpy()
        b = fresh(x).numpy()
    np.testing.assert_array_equal(a, b)


def test_export_swinir_roundtrip():
    ref = import_reference("network_swinir")
    torch.manual_seed(0)
    tmodel = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3, embed_dim=24,
        depths=[2, 2], num_heads=[4, 4], window_size=4, mlp_ratio=2.0,
        upscale=2, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv", drop_path_rate=0.0,
    )
    tmodel.eval()
    out = _roundtrip("swinir", tmodel, convert_swinir, scale=2)
    x = torch.from_numpy(
        np.random.default_rng(0).random((1, 3, 16, 16), np.float32)
    )
    _forward_equal(
        tmodel,
        lambda: ref.SwinIR(
            img_size=16, patch_size=1, in_chans=3, embed_dim=24,
            depths=[2, 2], num_heads=[4, 4], window_size=4, mlp_ratio=2.0,
            upscale=2, img_range=1.0, upsampler="pixelshuffle",
            resi_connection="1conv", drop_path_rate=0.0,
        ),
        out, x,
    )


@pytest.mark.parametrize("upsampler,resi", [
    ("pixelshuffledirect", "1conv"),
    ("nearest+conv", "3conv"),
])
def test_export_swinir_variants(upsampler, resi):
    ref = import_reference("network_swinir")
    torch.manual_seed(1)
    tmodel = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3, embed_dim=24,
        depths=[2], num_heads=[4], window_size=4, mlp_ratio=2.0,
        upscale=4 if upsampler == "nearest+conv" else 2, img_range=1.0,
        upsampler=upsampler, resi_connection=resi, drop_path_rate=0.0,
        ape=True,
    )
    tmodel.eval()
    _roundtrip("swinir", tmodel, convert_swinir,
               scale=4 if upsampler == "nearest+conv" else 2)


def test_export_hat_roundtrip():
    ref = import_reference("hat_arch")
    torch.manual_seed(0)
    kw = dict(
        img_size=16, patch_size=1, in_chans=3, embed_dim=24,
        depths=[2, 2], num_heads=[4, 4], window_size=4, compress_ratio=3,
        squeeze_factor=6, conv_scale=0.01, overlap_ratio=0.5,
        mlp_ratio=2.0, upscale=2, img_range=1.0,
        upsampler="pixelshuffle", resi_connection="1conv",
        drop_path_rate=0.0,
    )
    tmodel = ref.HAT(**kw)
    tmodel.eval()
    out = _roundtrip("hat", tmodel, convert_hat)
    x = torch.from_numpy(
        np.random.default_rng(1).random((1, 3, 16, 16), np.float32)
    )
    _forward_equal(tmodel, lambda: ref.HAT(**kw), out, x)


def test_export_dat_roundtrip():
    ref = import_reference("dat_arch")
    torch.manual_seed(0)
    kw = dict(
        img_size=16, in_chans=3, embed_dim=32, split_size=[2, 4],
        depth=[4, 4], num_heads=[4, 4], expansion_factor=2.0,
        qkv_bias=True, upscale=2, img_range=1.0,
        resi_connection="1conv", upsampler="pixelshuffle",
        drop_path_rate=0.0,
    )
    tmodel = ref.DAT(**kw)
    tmodel.eval()
    out = _roundtrip("dat", tmodel, convert_dat)
    x = torch.from_numpy(
        np.random.default_rng(2).random((1, 3, 16, 16), np.float32)
    )
    _forward_equal(tmodel, lambda: ref.DAT(**kw), out, x)


def test_export_msresunet_roundtrip():
    ref = import_reference("ms_resunet")
    torch.manual_seed(0)
    tmodel = ref.MS_ResUNet()
    tmodel.eval()
    _roundtrip("ms_resunet", tmodel, convert_msresunet)


def test_save_torch_checkpoint_loads_via_evaluate_loader(tmp_path):
    """The written .pt re-opens through the framework's own torch
    loader (wrapper-key unwrap) and matches the source weights."""
    ref = import_reference("network_swinir")
    torch.manual_seed(2)
    tmodel = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3, embed_dim=24,
        depths=[2], num_heads=[4], window_size=4, mlp_ratio=2.0,
        upscale=2, img_range=1.0, upsampler="pixelshuffledirect",
        resi_connection="1conv", drop_path_rate=0.0,
    )
    tmodel.eval()
    sd0 = extract_state_dict(tmodel.state_dict())
    variables = convert_swinir(sd0, scale=2)
    path = save_torch_checkpoint(
        "swinir", variables, str(tmp_path / "exported.pt")
    )

    from tpu_superresolution_tpu.interop import load_torch_checkpoint

    sd1 = load_torch_checkpoint(path)
    for k, v in sd1.items():
        np.testing.assert_array_equal(v, sd0[k], err_msg=k)


def test_export_torch_cli_full_circle(tmp_path, capsys):
    """train CLI -> export_torch CLI -> the exported .pt re-imports
    through the evaluate CLI's torch loader (architecture inferred from
    tensor shapes) and reproduces the framework checkpoint's metrics."""
    from tests.util_fakedata import make_deeprock_dataset
    from tpu_superresolution_tpu.cli.evaluate import main as eval_main
    from tpu_superresolution_tpu.cli.export_torch import main as export_main
    from tpu_superresolution_tpu.cli.train import main as train_main

    root = tmp_path / "data"
    make_deeprock_dataset(root, hr_size=48, scale="X2", n_per_split=6)
    train_main([
        "--data_root", str(root), "--scale", "X2", "--model", "swinir",
        "--embed_dim", "12", "--t_depths", "2", "--t_heads", "2",
        "--window_size", "4", "--patch_size", "16",
        "--epochs", "1", "--batch_size", "2", "--workdir", str(tmp_path),
        "--seed", "0",
    ])
    capsys.readouterr()
    pt = str(tmp_path / "exported_X2.pt")
    export_main(["--ckpt", str(tmp_path / "best_X2"), "--out", pt])

    common = ["--data_root", str(root), "--scale", "X2",
              "--save_n", "0", "--no_baseline", "--batch_size", "2"]
    ours = eval_main(["--ckpt", str(tmp_path / "best_X2")] + common)
    # exact semantics on both sides for an apples-to-apples comparison
    # (the torch path defaults to exact)
    theirs = eval_main(
        ["--ckpt", pt, "--model", "swinir", "--exact"] + common
    )
    ours_exact = eval_main(
        ["--ckpt", str(tmp_path / "best_X2"), "--exact"] + common
    )
    capsys.readouterr()
    assert abs(theirs["psnr"] - ours_exact["psnr"]) < 1e-3, (
        theirs["psnr"], ours_exact["psnr"], ours["psnr"],
    )

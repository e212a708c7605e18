"""Finetune CLI end-to-end: official-format torch checkpoint ->
converted init -> L1/cosine training -> evaluate CLI on the result.

Mirrors the reference flow (finetune_swinir.py:283-287 loads ckpt
['params'], trains, saves bests; evaluate on the test split)."""

import numpy as np
import pytest
import torch

from tests.util_fakedata import make_deeprock_dataset
from tests.util_torchref import import_reference


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("deeprock_ft")
    make_deeprock_dataset(root, hr_size=32, scale="X2", n_per_split=6)
    return root


@pytest.fixture(scope="module")
def official_ckpt(tmp_path_factory):
    """A torch checkpoint in the official SwinIR release format
    ({'params': state_dict}) for a tiny config."""
    ref = import_reference("network_swinir")
    torch.manual_seed(0)
    tmodel = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3, embed_dim=12,
        depths=[2], num_heads=[2], window_size=4, mlp_ratio=2.0,
        upscale=2, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv", drop_path_rate=0.0,
    )
    path = tmp_path_factory.mktemp("ckpt") / "swinir_tiny_x2.pth"
    torch.save({"params": tmodel.state_dict()}, str(path))
    return path, tmodel


def test_finetune_cli_from_torch_checkpoint(dataset, official_ckpt, tmp_path, capsys):
    path, tmodel = official_ckpt
    from tpu_superresolution_tpu.cli.finetune import main as ft_main

    ft_main([
        "--data_root", str(dataset), "--scale", "X2",
        "--weights", str(path),
        "--embed_dim", "12", "--depths", "2", "--num_heads", "2",
        "--window_size", "4", "--lr_patch", "16",
        "--epochs", "2", "--batch_size", "4", "--lr", "1e-4",
        "--workdir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "[weights] loaded torch checkpoint" in out
    assert "val_PSNR" in out
    assert (tmp_path / "best_X2").exists()
    assert (tmp_path / "bestpsnr_X2").exists()

    # evaluate CLI on the finetuned (native-LR convention) checkpoint
    from tpu_superresolution_tpu.cli.evaluate import main as eval_main

    results = eval_main([
        "--data_root", str(dataset), "--scale", "X2",
        "--ckpt", str(tmp_path / "best_X2"), "--save_n", "0",
        "--batch_size", "3", "--no_baseline",
    ])
    out = capsys.readouterr().out
    assert "[result] PSNR" in out
    assert results["n"] == 6 and np.isfinite(results["psnr"])


def test_finetune_cli_freeze(dataset, official_ckpt, tmp_path, capsys):
    path, _ = official_ckpt
    from tpu_superresolution_tpu.cli.finetune import main as ft_main

    ft_main([
        "--data_root", str(dataset), "--scale", "X2",
        "--weights", str(path),
        "--embed_dim", "12", "--depths", "2", "--num_heads", "2",
        "--window_size", "4", "--lr_patch", "16",
        "--epochs", "1", "--batch_size", "4",
        "--freeze_regex", "conv_first|layers_0",
        "--workdir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "[freeze] regex='conv_first|layers_0'" in out

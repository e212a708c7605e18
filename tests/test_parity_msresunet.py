"""Golden numerical parity: reference torch MS_ResUNet vs our Flax port.

The reference's own parity harness (torch vs onnxruntime) achieved max
abs diff 2.68e-6 (model_debug.ipynb cell 16); we target the same order
for a randomly-initialized torch model whose weights are converted with
interop/torch_convert.py.
"""

import numpy as np
import pytest
import torch

from tests.util_torchref import import_reference

from tpu_superresolution_tpu.core.config import MSResUNetConfig, build_model
from tpu_superresolution_tpu.interop import convert_msresunet, extract_state_dict


@pytest.fixture(scope="module")
def torch_model():
    ref = import_reference("ms_resunet")
    torch.manual_seed(0)
    model = ref.MS_ResUNet()
    model.eval()
    return model


def test_torch_param_count(torch_model):
    n = sum(p.numel() for p in torch_model.parameters())
    assert n == 24_918_369


def test_forward_parity(torch_model):
    sd = extract_state_dict(torch_model.state_dict())
    variables = convert_msresunet(sd)

    cfg = MSResUNetConfig()
    model = build_model(cfg)

    rng = np.random.default_rng(42)
    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)

    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    ours = np.asarray(model.apply(variables, x, train=False))
    diff = np.max(np.abs(ours - ref_out))
    assert ours.shape == ref_out.shape
    assert diff < 1e-4, f"max abs diff {diff:.3e}"


def test_converted_tree_matches_init_structure(torch_model):
    """Converted param tree must exactly match the Flax init structure
    (same leaves, same shapes) so checkpoints load strict."""
    import jax

    sd = extract_state_dict(torch_model.state_dict())
    converted = convert_msresunet(sd)

    cfg = MSResUNetConfig()
    model = build_model(cfg)
    init_vars = model.init(
        jax.random.key(0), np.zeros((1, 32, 32, 1), np.float32), train=False
    )

    from flax.traverse_util import flatten_dict

    for col in ("params", "batch_stats"):
        a = flatten_dict(init_vars[col])
        b = flatten_dict(converted[col])
        assert set(a) == set(b), (
            f"{col} key mismatch: only-init={sorted(set(a) - set(b))[:5]} "
            f"only-converted={sorted(set(b) - set(a))[:5]}"
        )
        for k in a:
            assert a[k].shape == b[k].shape, f"{col}/{k}: {a[k].shape} vs {b[k].shape}"

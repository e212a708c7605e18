"""StableHLO export round-trip (the ONNX-parity analog)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import SwinIRConfig, UNet2DConfig, build_model
from tpu_superresolution_tpu.interop.export import (
    export_model,
    export_parity,
    load_exported,
)


def test_export_roundtrip_file(tmp_path, rng):
    cfg = UNet2DConfig(base_channels=4, depth=1, norm="none")
    model = build_model(cfg)
    x0 = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x0, train=False)
    p = tmp_path / "unet.stablehlo"
    export_model(model, variables, (1, 16, 16, 1), path=str(p))
    assert p.stat().st_size > 0
    fn = load_exported(str(p))
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    out = np.asarray(fn(x))
    ref = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_export_parity_swinir(rng):
    cfg = SwinIRConfig(
        scale=2, img_size=16, window_size=4, embed_dim=8, depths=(1,),
        num_heads=(2,), upsampler="pixelshuffledirect", attention_impl="jnp",
    )
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    max_d, mean_d = export_parity(model, variables, (1, 16, 16, 3))
    # reference ONNX parity achieved 2.68e-6 max (model_debug.ipynb cell 16)
    assert max_d < 1e-5, (max_d, mean_d)

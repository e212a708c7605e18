"""Library quickstart: the five model families + core workflows.

Run:  python examples/quickstart.py
(uses a synthetic DeepRock-layout dataset; everything works on CPU or TPU)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # ------------------------------------------------------------------
    # 1. Build any model family from its config
    # ------------------------------------------------------------------
    from tpu_superresolution_tpu.core import (
        DATConfig,
        HATConfig,
        MSResUNetConfig,
        SwinIRConfig,
        UNet2DConfig,
        build_model,
    )

    swinir = build_model(
        SwinIRConfig(scale=4, embed_dim=60, depths=(2, 2), num_heads=(6, 6)),
        dtype=jnp.bfloat16,  # bf16 compute / fp32 params
    )
    lr = jnp.zeros((1, 64, 64, 3))
    variables = swinir.init(jax.random.key(0), lr, train=False)
    sr = jax.jit(lambda v, x: swinir.apply(v, x, train=False))(variables, lr)
    print("SwinIR x4:", lr.shape, "->", sr.shape)

    # ------------------------------------------------------------------
    # 2. Data pipeline: index -> loader (native C++ decode, host crops)
    # ------------------------------------------------------------------
    from util_fakedata import make_deeprock_dataset

    from tpu_superresolution_tpu.data import Loader, PairedIndex

    root = tempfile.mkdtemp()
    make_deeprock_dataset(root, hr_size=64, scale="X2", n_per_split=8)
    index = PairedIndex(root, split="train", scale="X2")
    loader = Loader(index, batch_size=4, shuffle=True,
                    host_crop_hr=32, host_crop_scale=2, cache_decoded=True)
    lr_np, hr_np = next(iter(loader))
    print("loader batch:", lr_np.shape, hr_np.shape)

    # ------------------------------------------------------------------
    # 3. Train: one jit'd step for every model
    # ------------------------------------------------------------------
    from tpu_superresolution_tpu.core import DataConfig, TrainConfig
    from tpu_superresolution_tpu.train.engine import (
        Trainer,
        build_optimizer,
        create_train_state,
    )

    mcfg = UNet2DConfig(base_channels=8, depth=2, residual=True)
    model = build_model(mcfg)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)), train=False)
    tcfg = TrainConfig(epochs=2, batch_size=4, loss="l1", lr=1e-3, scheduler="cosine")
    dcfg = DataConfig(data_root=root, scale="X2", patch_size=32)
    tx = build_optimizer(tcfg, len(loader), v["params"])
    state = create_train_state(model, v["params"], v.get("batch_stats", {}), tx)
    trainer = Trainer(model, mcfg, dcfg, tcfg, workdir=root)
    state = trainer.fit(state, loader, Loader(PairedIndex(root, "valid", "X2"), 4))

    # ------------------------------------------------------------------
    # 4. Evaluate: bicubic floor + tiled inference + metrics
    # ------------------------------------------------------------------
    from tpu_superresolution_tpu.core import EvalConfig
    from tpu_superresolution_tpu.evaluate import Evaluator, bicubic_baseline

    test_loader = Loader(PairedIndex(root, "test", "X2"), 4)
    floor = bicubic_baseline(test_loader, 2)
    ev = Evaluator(model, {"params": state.params, "batch_stats": state.batch_stats},
                   2, "pre_upscale", EvalConfig(tile_size=32, tile_overlap=8))
    res = ev.run(Loader(PairedIndex(root, "test", "X2"), 4))
    print(f"bicubic floor {floor['psnr']:.2f} dB | model {res['psnr']:.2f} dB")

    # ------------------------------------------------------------------
    # 5. Export for serving (StableHLO) with numerical parity check
    # ------------------------------------------------------------------
    from tpu_superresolution_tpu.interop.export import export_parity

    max_d, mean_d = export_parity(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        (1, 32, 32, 1),
    )
    print(f"export parity: max {max_d:.2e}")


if __name__ == "__main__":
    main()

"""Addendum: fused-vs-exact-chain compared directly WITHIN the tiled
path (does overlap blending feather the fused border ring away?)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import torch

    from util_torchref import import_reference

    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
    from tpu_superresolution_tpu.evaluate.tiling import tiled_forward
    from tpu_superresolution_tpu.interop import convert_swinir, extract_state_dict

    print("devices:", jax.devices(), flush=True)
    scale = 4
    ref = import_reference("network_swinir")
    torch.manual_seed(0)
    tmodel = ref.SwinIR(
        img_size=64, patch_size=1, in_chans=3, embed_dim=180,
        depths=[6] * 6, num_heads=[6] * 6, window_size=8, mlp_ratio=2.0,
        upscale=scale, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv", drop_path_rate=0.0,
    )
    variables = convert_swinir(extract_state_dict(tmodel.state_dict()), scale=scale)
    del tmodel
    rng = np.random.default_rng(0)
    base = rng.random((1, 32, 32, 3)).astype(np.float32)
    x = jnp.clip(jax.image.resize(jnp.asarray(base), (1, 256, 256, 3), "cubic"), 0, 1)

    outs = {}
    for fused in (True, False):
        cfg = SwinIRConfig(scale=scale, fused_reconstruct=fused,
                           gelu_approximate=True, drop_path_rate=0.0)
        model = build_model(cfg, dtype=jnp.bfloat16)
        fn = jax.jit(lambda im, m=model: tiled_forward(
            lambda b: m.apply(variables, b, train=False), im, scale, 64, 8
        ).astype(jnp.float32))
        outs[fused] = np.asarray(jax.block_until_ready(fn(x)))
        print(f"[done] fused={fused}", flush=True)
    ring = 3 * scale
    full = psnr(outs[True], outs[False])
    interior = psnr(outs[True][:, ring:-ring, ring:-ring],
                    outs[False][:, ring:-ring, ring:-ring])
    print(f"tiled fused-vs-chain: full {full:.2f} dB, interior {interior:.2f} dB",
          flush=True)


if __name__ == "__main__":
    main()

"""Production tiling guidance (VERDICT r2 item 9): sweep window-multiple
tile sizes and overlaps at production image sizes, measure MPix/s and
redundancy, and derive the recommended evaluate-CLI setting.

(The pinned bench.py workload — tile 64 / overlap 8 — stays untouched;
this informs the CLI docs.)

Run on the TPU: python experiments/tiling_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.evaluate.tiling import tile_grid, tiled_forward


def redundancy(size, tile, overlap):
    starts = tile_grid(size, tile, overlap)
    return len(starts) * tile / size


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = SwinIRConfig(scale=4, drop_path_rate=0.0)
    model = build_model(cfg, dtype=jnp.bfloat16)
    size = 1024  # production whole-image LR (-> 4096^2 out)
    x = jnp.asarray(rng.random((1, size, size, 3), np.float32), jnp.bfloat16)
    variables = model.init(jax.random.key(0), x[:, :64, :64], train=False)

    def tile_fn(batch):
        return model.apply(variables, batch, train=False)

    settings = [
        (64, 8, 64), (96, 16, 32), (128, 16, 16), (128, 32, 16),
        (192, 16, 8), (256, 32, 4),
    ]
    print(f"{'tile':>5s} {'ovl':>4s} {'mtb':>4s} {'redun':>6s} {'ms':>9s} {'MPix/s':>8s}",
          flush=True)
    for tile, overlap, mtb in settings:
        try:
            fn = jax.jit(lambda im, t=tile, o=overlap, m=mtb: tiled_forward(
                tile_fn, im, 4, t, o, max_tile_batch=m).astype(jnp.float32))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            print(f"[compile] tile {tile}/{overlap}: {time.perf_counter()-t0:.0f}s",
                  flush=True)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(x)
                jax.block_until_ready(out)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            r2 = redundancy(size, tile, overlap) ** 2
            mpix = (size * 4) ** 2 / 1e6 / best
            print(f"{tile:5d} {overlap:4d} {mtb:4d} {r2:6.2f} {best*1e3:9.1f} {mpix:8.1f}",
                  flush=True)
        except Exception as e:
            print(f"{tile:5d} {overlap:4d} {mtb:4d} FAILED: {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()

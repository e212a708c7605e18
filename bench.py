"""Benchmark: SwinIR-M x4 tiled whole-image inference throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The headline configuration from BASELINE.json: SwinIR x4 tiled inference
(tile grid + overlap blending as one jit'd program) in bf16 on a single
chip, MPix/s of OUTPUT pixels.  The reference published no transformer
throughput numbers (BASELINE.md), so vs_baseline is normalized to a
fixed reference constant measured for this harness's first working
version (round 1); later rounds show speedups against it.
"""

from __future__ import annotations

import json
import time

# Round-1 recorded value (MPix/s output, v5e single chip, pure-jnp
# attention path); later rounds report vs_baseline = value / this.
ROUND1_BASELINE_MPIX_S = 5.87


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
    from tpu_superresolution_tpu.evaluate.tiling import tiled_forward

    cfg = SwinIRConfig(scale=4)  # SwinIR-M classical
    model = build_model(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # 256x256 LR -> 1024x1024 SR, tiled 64/8 (window-multiple tiles)
    x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
    variables = model.init(jax.random.key(0), x[:, :64, :64, :], train=False)

    def tile_fn(batch):
        return model.apply(variables, batch, train=False)

    @jax.jit
    def run(img):
        return tiled_forward(tile_fn, img, 4, tile=64, overlap=8).astype(jnp.float32)

    out = jax.block_until_ready(run(x))  # compile
    assert out.shape == (1, 1024, 1024, 3), out.shape
    assert bool(jnp.isfinite(out).all()), "non-finite bench output"

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    mpix = out.shape[1] * out.shape[2] / 1e6
    value = mpix / dt

    # MFU of the executed program (includes the tile-overlap redundancy
    # — this is utilization of the chip, not useful-work efficiency).
    # Analytic FLOPs, NOT xla cost_analysis: the Pallas megakernel is a
    # custom call whose FLOPs XLA cannot see (measured: cost_analysis
    # reports ~0.45 TFLOP vs ~2.8 TFLOP analytic for this program).
    try:
        from tpu_superresolution_tpu.evaluate.tiling import tile_grid
        from tpu_superresolution_tpu.utils.flops import mfu, swinir_flops

        n_tiles = len(tile_grid(256, 64, 8)) ** 2
        flops = n_tiles * swinir_flops(cfg, 64, 64)
        mfu_val = round(mfu(flops, dt), 4)
    except Exception:
        mfu_val = None

    print(
        json.dumps(
            {
                "metric": "swinir_m_x4_tiled_inference",
                "value": round(value, 2),
                "unit": "MPix/s/chip",
                "vs_baseline": round(value / ROUND1_BASELINE_MPIX_S, 3),
                "mfu": mfu_val,
            }
        )
    )


if __name__ == "__main__":
    main()

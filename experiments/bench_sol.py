"""Bench speed-of-light decomposition (VERDICT r4 next-step #4).

Decomposes the pinned bench workload (SwinIR-M x4, 256^2 LR tiled
64/8 -> 25x [25,64,64] tile batch, bf16) into per-component measured
times via the interleaved on-device ablate harness, and quotes each
component's analytic roofline (v5e: 197 TFLOP/s bf16 MXU, ~819 GB/s
HBM) so the remaining gap to speed of light is attributable.

Components:
  full        whole jit'd bench program (tiles + 36 blocks + blend)
  body24      SwinIR with depths (6,)x1 vs full (6,)x6: the delta is
              30 SwinBlocks + 5 RSTB convs -> per-block in-model cost
  mega1       ONE fused SwinBlock megakernel standalone at [25,64x64]
  conv3x3     one 180->180 conv3x3 at [25,64,64] (XLA, 1-arg mixed)
  embedln     patch-embed LN at [25,64,64,180]
  recon       fused reconstruction (conv5x5+pixel_shuffle) standalone
  blend_only  tiled_forward with a FLOP-free tile_fn (pixel-repeat x4):
              tile extraction + overlap blending + assembly overhead

All thunks take the fp32 carry and mix it into their input (round-3
lesson: argless pure-HLO candidates get hoisted out of the fori_loop).
"""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

from tpu_superresolution_tpu.core.config import SwinIRConfig, build_model
from tpu_superresolution_tpu.evaluate.tiling import tile_grid, tiled_forward
from tpu_superresolution_tpu.utils.ablate import ablate, report

PEAK_FLOPS = 197e12
PEAK_HBM = 819e9

cfg = SwinIRConfig(scale=4)
model = build_model(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
v = model.init(jax.random.key(0), x[:, :64, :64, :], train=False)

n_tiles = len(tile_grid(256, 64, 8)) ** 2
print("tiles:", n_tiles, flush=True)

# 1-block model sharing the full model's first-group params
cfg1 = SwinIRConfig(scale=4, depths=(6,), num_heads=(6,))
model1 = build_model(cfg1, dtype=jnp.bfloat16)
v1 = model1.init(jax.random.key(0), x[:, :64, :64, :], train=False)

tb = jnp.asarray(rng.random((n_tiles, 64, 64, 3), np.float32))
feat = jnp.asarray(
    rng.standard_normal((n_tiles, 64, 64, cfg.embed_dim)), jnp.bfloat16
)

mix = lambda t, s: t + (s * 1e-30).astype(t.dtype)


def full(s):
    return tiled_forward(
        lambda b: model.apply(v, b, train=False), mix(x, s), 4,
        tile=64, overlap=8,
    )


def body6(s):
    return model1.apply(v1, mix(tb, s), train=False)


def mega1(s):
    from tpu_superresolution_tpu.models.blocks import LayerNormParams  # noqa
    from tpu_superresolution_tpu.ops.pallas.fused_block import (
        fused_swin_block,
    )

    p = v1["params"]["layers_0"]["blocks_0"]
    a = p["attn"]
    from tpu_superresolution_tpu.ops.window import relative_position_index

    rpi = relative_position_index(8)
    tbl = a["relative_position_bias_table"]
    bias = tbl[rpi.reshape(-1)].reshape(64, 64, 6).transpose(2, 0, 1)
    return fused_swin_block(
        mix(feat, s), p["norm1"]["scale"], p["norm1"]["bias"],
        a["qkv"]["kernel"], a["qkv"]["bias"],
        a["proj"]["kernel"], a["proj"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        jnp.asarray(bias, jnp.float32), 8, None, 30 ** -0.5, True,
    )


def conv3x3(s):
    w = v["params"]["conv_after_body"]["kernel"].astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        mix(feat, s), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def embedln(s):
    t = mix(feat, s).astype(jnp.float32)
    mu = t.mean(-1, keepdims=True)
    var = ((t - mu) ** 2).mean(-1, keepdims=True)
    out = (t - mu) * jax.lax.rsqrt(var + 1e-5)
    return out.astype(jnp.bfloat16)


def blend_only(s):
    def rep(b):
        return jnp.repeat(jnp.repeat(b, 4, axis=1), 4, axis=2)

    return tiled_forward(rep, mix(x, s), 4, tile=64, overlap=8)


cands = {
    "full": full,
    "body6(1grp)": body6,
    "mega1": mega1,
    "conv3x3": conv3x3,
    "embedln": embedln,
    "blend_only": blend_only,
}
res = ablate(cands, inner=20, rounds=6, verbose=False)
print(report(res), flush=True)

# ---- analytic floors ----
T = n_tiles * 64 * 64
C, HID = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
gemm_flops = 2 * T * (C * 3 * C + C * C + 2 * C * HID)
attn_flops = 2 * T * 2 * 64 * C
blk_mxu = (gemm_flops + attn_flops) / PEAK_FLOPS
blk_hbm = 2 * T * C * 2 / PEAK_HBM  # read x + write out, bf16
print(f"\nfloors: megakernel/block MXU {blk_mxu*1e3:.3f} ms, "
      f"HBM {blk_hbm*1e3:.3f} ms", flush=True)
conv_mxu = 2 * T * 9 * C * C / PEAK_FLOPS
print(f"conv3x3 180->180 MXU {conv_mxu*1e3:.3f} ms, HBM {blk_hbm*1e3:.3f} ms",
      flush=True)
full_min = res["full"].min_s
mega_min = res["mega1"].min_s
print(f"\n36 x mega1 = {36*mega_min*1e3:.1f} ms of {full_min*1e3:.1f} ms full",
      flush=True)
print("ALL DONE", flush=True)

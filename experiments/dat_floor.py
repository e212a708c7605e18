"""DAT floor analysis (VERDICT r2 item 5): where do DAT's 136 ms go,
and how far is each piece from its compute/bandwidth floor?

Times standalone DATB components at production geometry (256x256x180
bf16) with the interleaved on-device harness, and prints compute /
HBM-bandwidth rooflines for comparison.

Run on the TPU: python experiments/dat_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.models.dat import (
    DATB,
    SGFN,
    AdaptiveChannelAttention,
    AdaptiveSpatialAttention,
)
import time

V5E_PEAK = 197e12
V5E_HBM = 819e9  # bytes/s


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    H = W = 256
    C = 180
    dt = jnp.bfloat16
    x = jnp.asarray(rng.random((1, H, W, C), np.float32), dt)

    mods = {
        "datb_spatial": DATB(C, 6, (8, 16), 2.0, True, rg_idx=0, b_idx=0, dtype=dt),
        "datb_spatial_shift": DATB(C, 6, (8, 16), 2.0, True, rg_idx=0, b_idx=2, dtype=dt),
        "datb_channel": DATB(C, 6, (8, 16), 2.0, True, rg_idx=0, b_idx=1, dtype=dt),
        "spatial_attn": AdaptiveSpatialAttention(C, 6, (8, 16), True, False, dtype=dt),
        "channel_attn": AdaptiveChannelAttention(C, 6, True, dtype=dt),
        "sgfn": SGFN(2 * C, C, dtype=dt),
    }
    fns = {}
    for name, m in mods.items():
        v = m.init(jax.random.key(0), x)
        fns[name] = jax.jit(lambda x, m=m, v=v: m.apply(v, x).astype(jnp.float32))
        t0 = time.perf_counter()
        jax.block_until_ready(fns[name](x))
        print(f"[compile] {name}: {time.perf_counter() - t0:.0f}s", flush=True)

    times = {t: [] for t in fns}
    for r in range(6):
        for tag, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = fn(x)
            jax.block_until_ready(out)
            times[tag].append((time.perf_counter() - t0) / 20)
    print("\n=== DAT components, 256x256x180 bf16 (ms) ===", flush=True)
    for tag, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{tag:20s} min {min(ts)*1e3:7.3f}  median {sorted(ts)[len(ts)//2]*1e3:7.3f}",
              flush=True)
    class R:
        def __init__(s, v): s.min_s = v
    res = {k: R(min(v)) for k, v in times.items()}

    # rooflines
    l = H * W
    qkv, proj = 2 * l * C * 3 * C, 2 * l * C * C
    attn_sp = 2 * 2 * l * 128 * C
    hd = C // 6
    attn_ch = 2 * 2 * l * C * hd
    sgfn_f = 2 * l * C * 2 * C + 2 * l * C * 9 + 2 * l * C * C
    f_sp = qkv + attn_sp + proj + sgfn_f
    f_ch = qkv + attn_ch + proj + sgfn_f
    # bandwidth: materialized [nW, nh, N, N] attention maps dominate the
    # jnp spatial path: 2 branches x [512, 3, 128, 128] fp32 (scores +
    # softmax out, ~2 passes each)
    attn_bytes = 2 * 2 * 2 * (512 * 3 * 128 * 128) * 4
    act_bytes = 30 * l * C * 2  # ~30 activation passes bf16
    print(f"\nspatial DATB: {f_sp/1e9:.1f} GFLOP -> {f_sp/V5E_PEAK*1e3:.2f} ms MXU floor; "
          f"attn tensors {attn_bytes/1e6:.0f} MB -> {attn_bytes/V5E_HBM*1e3:.2f} ms HBM; "
          f"activations ~{act_bytes/1e6:.0f} MB -> {act_bytes/V5E_HBM*1e3:.2f} ms", flush=True)
    print(f"channel DATB: {f_ch/1e9:.1f} GFLOP -> {f_ch/V5E_PEAK*1e3:.2f} ms MXU floor", flush=True)
    n_sp, n_ch = 18, 18
    t_sp = res["datb_spatial"].min_s
    t_sps = res["datb_spatial_shift"].min_s
    t_ch = res["datb_channel"].min_s
    body = (9 * t_sp + 9 * t_sps + n_ch * t_ch) * 1e3
    print(f"\nprojected body: 9*{t_sp*1e3:.2f} + 9*{t_sps*1e3:.2f} + 18*{t_ch*1e3:.2f} "
          f"= {body:.1f} ms (+ convs/recon; measured whole model 136.4)", flush=True)


if __name__ == "__main__":
    main()

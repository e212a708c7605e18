"""Test-set evaluation: metrics + bicubic baseline + selective PNG dumps.

Capability parity with the reference evaluate CLI (evaluate.py:54-234):
peek-batch sanity print, bicubic floor, non-finite prediction raise with
badness stats (:172-178), bilinear spatial realign fallback (:181-184),
PSNR fp32 + SSIM, per-sample save modes first-N / every-Nth-from-start /
explicit index list (:63-70,199-225) with files idx_{i:06d}_{lr,hr,sr}.png,
wall-time + throughput report.  Adds the TPU-native tiled whole-image
path, an MPix/s metric (the BASELINE.json north star), and an optional
x8 geometric self-ensemble (EvalConfig.self_ensemble — standard SR
test-time augmentation the reference lacks).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_superresolution_tpu.core.config import EvalConfig
from tpu_superresolution_tpu.data.transforms import pre_upscale_batch
from tpu_superresolution_tpu.evaluate.tiling import tiled_forward
from tpu_superresolution_tpu.ops.metrics import batch_psnr, psnr, ssim
from tpu_superresolution_tpu.ops.resize import resize_bilinear


def tensor_to_pil(x: np.ndarray, per_image_rescale: bool = False):
    """[H, W, C] float -> PIL image (evaluate.py:31-51 semantics:
    min-max rescale option, else clamp to [0,1])."""
    from PIL import Image

    x = np.asarray(x, dtype=np.float32)
    if per_image_rescale:
        mn, mx = float(x.min()), float(x.max())
        x = np.zeros_like(x) if mx <= mn + 1e-8 else (x - mn) / (mx - mn)
    else:
        x = np.clip(x, 0.0, 1.0)
    arr = (x * 255.0 + 0.5).astype(np.uint8)
    if arr.shape[-1] == 1:
        return Image.fromarray(arr[..., 0], mode="L")
    return Image.fromarray(arr, mode="RGB")


def save_tensor_as_png(x: np.ndarray, path, per_image_rescale: bool = False):
    tensor_to_pil(x, per_image_rescale).save(str(path))


def _geo(x, k: int, flip: bool):
    """One of the 8 dihedral transforms on an NHWC batch (flip first,
    then k quarter-turns over the spatial axes)."""
    if flip:
        x = x[:, :, ::-1]
    if k:
        x = jnp.rot90(x, k, axes=(1, 2))
    return x


def _geo_inv(x, k: int, flip: bool):
    if k:
        x = jnp.rot90(x, -k, axes=(1, 2))
    if flip:
        x = x[:, :, ::-1]
    return x


def _save_decision(i: int, cfg: EvalConfig) -> bool:
    """Reference selection rules (evaluate.py:63-70,199-207):
    save_indices has priority, then save_every from save_start, else
    first save_n samples."""
    if cfg.save_indices:
        return i in cfg.save_indices
    if cfg.save_every:
        return i >= cfg.save_start and (i - cfg.save_start) % cfg.save_every == 0
    return i < cfg.save_n


@dataclass
class Evaluator:
    model: object
    variables: dict
    scale: int
    convention: str = "pre_upscale"  # model input convention
    eval_config: EvalConfig = field(default_factory=EvalConfig)
    log: Callable[[str], None] = print
    mesh: object = None  # jax Mesh: shard the tile batch across chips

    def forward_fn(self):
        """The jitted [B,H,W,C]->[B,H*s,W*s,C] forward (pre-upscale /
        tiling / sharding per the eval config) — the reusable
        inference entry point (cli/upscale.py rides it for single
        images)."""
        ecfg = self.eval_config
        upsamples = self.convention == "native_lr"
        s = self.scale if upsamples else 1

        def tile_apply(batch):
            return self.model.apply(self.variables, batch, train=False)

        def pipeline(lr):
            if self.convention == "pre_upscale":
                lr = pre_upscale_batch(lr, self.scale)
            if ecfg.tile_size:
                if self.mesh is not None:
                    from tpu_superresolution_tpu.evaluate.tiling import (
                        sharded_tiled_forward,
                    )

                    out = sharded_tiled_forward(
                        tile_apply, lr, s, ecfg.tile_size, ecfg.tile_overlap,
                        self.mesh, max_tile_batch=ecfg.max_tile_batch,
                    )
                else:
                    out = tiled_forward(
                        tile_apply, lr, s, ecfg.tile_size, ecfg.tile_overlap,
                        max_tile_batch=ecfg.max_tile_batch,
                    )
            else:
                out = tile_apply(lr)
            return out.astype(jnp.float32)

        @jax.jit
        def run(lr):
            if not ecfg.self_ensemble:
                return pipeline(lr)
            # x8 dihedral TTA: each variant is a statically-shaped
            # branch of one jit program (rotations swap H/W — fine
            # under jit, the grid/tiling is re-traced per orientation);
            # outputs are inverse-mapped and averaged in fp32.
            acc = None
            for k in range(4):
                for flip in (False, True):
                    o = _geo_inv(pipeline(_geo(lr, k, flip)), k, flip)
                    acc = o if acc is None else acc + o
            return acc / 8.0

        return run

    def run(self, loader, save_dir: Optional[str] = None) -> Dict[str, float]:
        ecfg = self.eval_config
        fwd = self.forward_fn()
        if save_dir:
            Path(save_dir).mkdir(parents=True, exist_ok=True)

        peeked = False
        psnr_sum = ssim_sum = n = 0.0
        out_pixels = 0
        t0 = time.time()
        compile_t = 0.0
        # batch shapes seen -> (dtype, count); FLOPs are computed AFTER
        # the loop so XLA cost-analysis compiles never pollute the
        # steady-time metrics (mpix_per_s, mfu)
        shape_counts: Dict[tuple, list] = {}
        idx = 0
        for lr_np, hr_np in loader:
            lr = jnp.asarray(lr_np)
            hr = jnp.asarray(hr_np, dtype=jnp.float32)
            if not peeked:
                self.log(
                    f"[peek] lr min/max: {np.nanmin(lr_np):.4f} {np.nanmax(lr_np):.4f} "
                    f"| hr min/max: {np.nanmin(hr_np):.4f} {np.nanmax(hr_np):.4f} "
                    f"| shapes: {tuple(lr_np.shape)} {tuple(hr_np.shape)}"
                )
                peeked = True
            if lr.shape not in shape_counts:
                # first call at a new batch shape jit-compiles: time it
                # separately so every per-shape compile is excluded from
                # steady time, not just the first
                shape_counts[lr.shape] = [lr.dtype, 0]
                tc = time.time()
                out = jax.block_until_ready(fwd(lr))
                compile_t += time.time() - tc
            else:
                out = fwd(lr)
            shape_counts[lr.shape][1] += 1

            # non-finite raise with stats (evaluate.py:172-178)
            out_np = np.asarray(out)
            finite = np.isfinite(out_np)
            if not finite.all():
                share = 1.0 - finite.mean()
                fv = out_np[finite]
                raise RuntimeError(
                    f"Non-finite predictions: share={share:.4f}, "
                    f"finite_min={fv.min() if fv.size else float('nan')}, "
                    f"finite_max={fv.max() if fv.size else float('nan')}"
                )

            # bilinear realign fallback (evaluate.py:181-184)
            if out.shape[1:3] != hr.shape[1:3]:
                out = resize_bilinear(out, hr.shape[1], hr.shape[2], antialias=False)

            psnr_sum += float(batch_psnr(out, hr).sum())
            ssim_sum += float(
                ssim(jnp.clip(out, 0.0, 1.0), jnp.clip(hr, 0.0, 1.0))
            ) * lr.shape[0]
            n += lr.shape[0]
            out_pixels += int(np.prod(out.shape[:3]))

            if save_dir:
                lr_vis = np.asarray(
                    pre_upscale_batch(lr, self.scale)
                    if self.convention == "native_lr"
                    else lr
                )
                for b in range(lr.shape[0]):
                    if _save_decision(idx + b, ecfg):
                        stem = f"idx_{idx + b:06d}"
                        save_tensor_as_png(
                            lr_vis[b], Path(save_dir) / f"{stem}_lr.png", ecfg.rescale_png
                        )
                        save_tensor_as_png(
                            np.asarray(hr)[b], Path(save_dir) / f"{stem}_hr.png", ecfg.rescale_png
                        )
                        save_tensor_as_png(
                            out_np[b], Path(save_dir) / f"{stem}_sr.png", ecfg.rescale_png
                        )
            idx += lr.shape[0]

        wall = time.time() - t0
        steady = max(wall - compile_t, 1e-9)
        results = {
            "psnr": psnr_sum / max(n, 1.0),
            "ssim": ssim_sum / max(n, 1.0),
            "n": int(n),
            "wall_s": wall,
            "compile_s": compile_t,
            "mpix_per_s": out_pixels / 1e6 / steady,
        }
        if jax.default_backend() == "tpu":
            # exact compiled-program FLOPs per batch shape (XLA cost
            # analysis over ShapeDtypeStructs — covers tiling/sharding);
            # feeds the MFU line (speed-of-light self-reporting,
            # reference flops() habit: network_swinir.py:842-851).
            # Computed here, outside the timing window, and only on TPU
            # where mfu is reported.
            try:
                from tpu_superresolution_tpu.utils.flops import mfu, xla_flops

                total_flops = sum(
                    xla_flops(fwd, jax.ShapeDtypeStruct(shape, dt)) * cnt
                    for shape, (dt, cnt) in shape_counts.items()
                )
                if total_flops:
                    # whole-eval-loop MFU (metrics/IO included) — a lower
                    # bound on the model's own utilization
                    results["mfu"] = round(mfu(total_flops, steady), 4)
            except Exception:
                pass
        self.log(
            f"[done] n={results['n']} PSNR {results['psnr']:.2f} dB | "
            f"SSIM {results['ssim']:.4f} | {wall:.1f}s "
            f"({results['mpix_per_s']:.1f} MPix/s steady)"
        )
        return results

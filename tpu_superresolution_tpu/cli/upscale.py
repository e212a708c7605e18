"""Single-image super-resolution CLI — upscale arbitrary PNG/JPG files
with a framework (Orbax) checkpoint or a reference torch ``.pt/.pth``:

    python -m tpu_superresolution_tpu.cli.upscale \\
        --ckpt runs/bestpsnr_X4 --image photo.png

The reference exposes inference only through the dataset evaluate
harness (``/root/reference/modules/evaluate.py:54-234`` iterates a
DeepRockSR directory tree); this is the missing user-facing entry
point: decode -> (optionally tiled) model forward -> PNG.  Large
images tile automatically with the measured production setting
(tile 192 / overlap 16 / tile_batch 8 — PARITY.md round 3).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

# Auto-tiling threshold on the LONG edge: whole-image forward below it
# (attention sees full context — best quality); tiled above it to
# bound compile time and HBM.
AUTO_TILE_MIN_EDGE = 256
AUTO_TILE = 192
AUTO_OVERLAP = 16
AUTO_TILE_BATCH = 8


def auto_tile(h: int, w: int) -> int:
    """0 (whole image) below the long-edge threshold, else the measured
    production tile."""
    return AUTO_TILE if max(h, w) > AUTO_TILE_MIN_EDGE else 0


def load_for_inference(ckpt: str, model_name: str, scale_arg, exact):
    """Shared upscale/serve checkpoint loading with clear errors:
    returns (mcfg, model, variables, scale, convention, channels).
    `scale_arg` is the CLI's 'X2'/'X4'/None."""
    from tpu_superresolution_tpu.cli.evaluate import load_any_checkpoint

    is_torch = ckpt.endswith((".pt", ".pth"))
    if is_torch and scale_arg is None:
        raise SystemExit("--scale is required for torch .pt/.pth checkpoints")
    if not is_torch:
        from tpu_superresolution_tpu.train.checkpoint import (
            model_config_from_checkpoint,
        )

        if model_config_from_checkpoint(ckpt) is None and scale_arg is None:
            raise SystemExit(
                f"{ckpt}: checkpoint carries no embedded model config — "
                "pass --scale (and --model for non-default architectures) "
                "to load it as a default-architecture checkpoint"
            )
    scale_int = int(scale_arg[1:]) if scale_arg else 0
    mcfg, model, variables = load_any_checkpoint(
        ckpt, model_name, scale_int, exact=exact
    )
    if scale_arg and mcfg.scale != scale_int:
        raise SystemExit(
            f"checkpoint is X{mcfg.scale} but --scale {scale_arg} was given"
        )
    convention = "native_lr" if mcfg.upsamples_internally else "pre_upscale"
    return (mcfg, model, variables, mcfg.scale, convention,
            mcfg.in_channels)


class ForwardCache:
    """Per-(tile, overlap) jitted whole-image forwards sharing one
    loaded model (used by this CLI and cli/serve.py).  jit's
    shape-keyed cache reuses compiles across same-sized inputs; the
    per-config cache itself is FIFO-bounded so client-driven tiling
    configs (serve's ?tile=N) can't grow it without bound."""

    def __init__(self, model, variables, scale, convention, tile_batch,
                 mesh=None, max_entries=8):
        self.model, self.variables = model, variables
        self.scale, self.convention = scale, convention
        self.tile_batch, self.mesh = tile_batch, mesh
        self.max_entries = max_entries
        self._cache = {}

    def get(self, tile, overlap):
        from tpu_superresolution_tpu.core.config import EvalConfig
        from tpu_superresolution_tpu.evaluate.runner import Evaluator

        if not tile and self.mesh is not None:
            raise SystemExit("--dp requires tiling (the image is below "
                             "the auto-tile threshold; pass --tile N)")
        key = (tile, overlap)
        if key not in self._cache:
            if len(self._cache) >= self.max_entries:
                # FIFO evict: dropping the closure frees its compiled
                # executables with it
                self._cache.pop(next(iter(self._cache)))
            ecfg = EvalConfig(
                batch_size=1,
                tile_size=tile or None,
                tile_overlap=overlap,
                max_tile_batch=self.tile_batch or None,
            )
            self._cache[key] = Evaluator(
                self.model, self.variables, self.scale, self.convention,
                ecfg, mesh=self.mesh,
            ).forward_fn()
        return self._cache[key]


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", type=str, nargs="+", required=True,
                    help="input image file(s)")
    ap.add_argument("--ckpt", type=str, required=True,
                    help="Orbax checkpoint dir (train CLI output) or a "
                         "reference torch .pt/.pth")
    ap.add_argument("--model", type=str, default="ms_resunet",
                    choices=["ms_resunet", "unet2d", "swinir", "hat", "dat"],
                    help="architecture for torch .pt/.pth or config-less "
                         "checkpoints (Orbax train-CLI checkpoints carry "
                         "their config)")
    ap.add_argument("--scale", type=str, choices=["X2", "X4"], default=None,
                    help="required for torch checkpoints; Orbax "
                         "checkpoints carry their scale")
    ap.add_argument("--out", type=str, default=None,
                    help="output file (single input) or directory "
                         "(default: next to each input as "
                         "<stem>_srNx.png)")
    ap.add_argument("--tile", type=int, default=-1,
                    help="-1 = auto (whole image if its long edge is "
                         f"<= {AUTO_TILE_MIN_EDGE}px, else tile "
                         f"{AUTO_TILE}/{AUTO_OVERLAP}); 0 = force whole "
                         "image; N = tile size")
    ap.add_argument("--tile_overlap", type=int, default=AUTO_OVERLAP)
    ap.add_argument("--tile_batch", type=int, default=AUTO_TILE_BATCH,
                    help="max tiles per model call (0 = all in one batch)")
    ap.add_argument("--exact", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="reference-exact semantics (see evaluate CLI); "
                         "default ON for torch checkpoints, "
                         "as-trained for framework checkpoints")
    ap.add_argument("--rescale_png", action="store_true",
                    help="min-max rescale the output instead of clamping")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard the tile batch across N mesh devices "
                         "(requires tiling — auto or explicit)")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from tpu_superresolution_tpu.cli.common import report_devices
    from tpu_superresolution_tpu.data.decode import decode_image
    from tpu_superresolution_tpu.evaluate.runner import save_tensor_as_png

    report_devices()
    mcfg, model, variables, scale, convention, channels = load_for_inference(
        args.ckpt, args.model, args.scale, args.exact
    )
    print(f"[ckpt] {args.ckpt}: model={mcfg.name} scale=X{scale}")

    outs = []
    multi = len(args.image) > 1
    out_dir = None
    if args.out is not None and (multi or Path(args.out).is_dir()):
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp
    import numpy as np

    mesh = None
    if args.dp and args.dp > 1:
        from tpu_superresolution_tpu.parallel import make_mesh

        mesh = make_mesh(args.dp)
        print(f"[dp] sharded tiled inference over {args.dp} devices")

    fwd_cache = ForwardCache(
        model, variables, scale, convention, args.tile_batch, mesh=mesh
    )

    def forward_for(tile):
        return fwd_cache.get(tile, args.tile_overlap)

    used_names = set()
    for path in args.image:
        p = Path(path)
        img = decode_image(p, grayscale=channels == 1, channels=channels)
        h, w = img.shape[:2]
        tile = args.tile if args.tile >= 0 else auto_tile(h, w)
        fwd = forward_for(tile)
        t0 = time.time()
        sr = fwd(jnp.asarray(img)[None])[0]
        sr.block_until_ready()
        dt = time.time() - t0
        if out_dir is not None:
            out_path = out_dir / f"{p.stem}_sr{scale}x.png"
            k = 1
            while str(out_path) in used_names:  # same stem, different dir
                out_path = out_dir / f"{p.stem}_sr{scale}x_{k}.png"
                k += 1
            used_names.add(str(out_path))
        elif args.out is not None:
            out_path = Path(args.out)
        else:
            out_path = p.with_name(f"{p.stem}_sr{scale}x.png")
        save_tensor_as_png(
            np.asarray(sr), out_path, per_image_rescale=args.rescale_png
        )
        mode = f"tile {tile}/{args.tile_overlap}" if tile else "whole image"
        print(f"[sr] {p} [{h}x{w}] -> {out_path} "
              f"[{h * scale}x{w * scale}] ({mode}, {dt:.1f}s incl. compile)")
        outs.append(str(out_path))
    return outs


if __name__ == "__main__":
    main()

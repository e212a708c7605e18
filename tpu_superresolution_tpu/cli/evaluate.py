"""Evaluation CLI — capability parity with the reference evaluate.py:54-234:

    python -m tpu_superresolution_tpu.cli.evaluate \
        --data_root /path/DeepRockSR-2D --scale X2 --ckpt best_X2 \
        --save_n 16 --save_dir preds

Computes the bicubic baseline, evaluates the checkpointed model on the
test split (full-image or --tile tiled with overlap blending), and dumps
LR/HR/SR PNG triplets per the save rules.
"""

from __future__ import annotations

import argparse

from tpu_superresolution_tpu.cli.common import report_devices, resolve_workers
from tpu_superresolution_tpu.core.config import EvalConfig, build_model
from tpu_superresolution_tpu.data import Loader, PairedIndex
from tpu_superresolution_tpu.evaluate.baseline import bicubic_baseline
from tpu_superresolution_tpu.evaluate.runner import Evaluator


def _load_torch_checkpoint(model_name: str, path: str, scale: int, exact: bool):
    """Convert a reference torch checkpoint to flax variables.  The
    architecture (width/depth/heads/window/upsampler) is INFERRED from
    the state-dict tensor shapes (interop.infer_config) so non-default
    checkpoints evaluate correctly — the reference's evaluate.py:136-145
    hardcodes the published defaults and fails opaquely on anything else.

    `exact=True` (the default for torch checkpoints) disables the
    production approximations (fused_reconstruct border ring, tanh gelu)
    so reported PSNR/SSIM is bit-parity with evaluating the same weights
    through the reference."""
    import dataclasses

    from tpu_superresolution_tpu.interop import (
        convert_dat,
        convert_hat,
        convert_msresunet,
        convert_swinir,
        infer_config,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    mcfg = infer_config(model_name, sd, scale)
    if exact:
        over = {
            k: v
            for k, v in (("fused_reconstruct", False), ("gelu_approximate", False))
            if hasattr(mcfg, k)
        }
        if over:
            mcfg = dataclasses.replace(mcfg, **over)
    if model_name == "ms_resunet":
        return mcfg, convert_msresunet(sd)
    if model_name == "swinir":
        return mcfg, convert_swinir(sd, scale=scale)
    if model_name == "hat":
        return mcfg, convert_hat(sd)
    return mcfg, convert_dat(sd)


def load_any_checkpoint(ckpt: str, model_name: str, scale_int: int,
                        exact=None):
    """Load a torch .pt/.pth (architecture inferred from tensor shapes)
    or an Orbax checkpoint dir (config embedded).  Returns
    (model_config, model, variables).  `exact=None` defaults to
    reference-exact semantics for torch checkpoints only."""
    if ckpt.endswith((".pt", ".pth")):
        ex = True if exact is None else exact
        mcfg, variables = _load_torch_checkpoint(model_name, ckpt, scale_int, ex)
        return mcfg, build_model(mcfg), variables

    from tpu_superresolution_tpu.train.checkpoint import (
        load_weights_only,
        model_config_from_checkpoint,
    )

    mcfg = model_config_from_checkpoint(ckpt)
    if mcfg is None:
        # config-less checkpoint (e.g. produced outside the train CLI):
        # fall back to the default architecture named by --model at
        # --scale, matching the torch-checkpoint convention
        from tpu_superresolution_tpu import models as _models  # noqa: F401
        from tpu_superresolution_tpu.core.config import model_registry

        config_cls, _ = model_registry[model_name]
        mcfg = config_cls(scale=scale_int)
    if exact:
        import dataclasses

        over = {
            k: v
            for k, v in (("fused_reconstruct", False), ("gelu_approximate", False))
            if hasattr(mcfg, k)
        }
        if over:
            mcfg = dataclasses.replace(mcfg, **over)
    restored, _meta = load_weights_only(ckpt)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return mcfg, build_model(mcfg), variables


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", type=str, choices=["X2", "X4"], required=True)
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--model", type=str, default="ms_resunet",
                    choices=["ms_resunet", "unet2d", "swinir", "hat", "dat"],
                    help="architecture for torch .pt/.pth or config-less "
                         "checkpoints (Orbax checkpoints carry their "
                         "config and ignore this)")
    ap.add_argument("--ckpt", type=str, required=True,
                    help="Orbax checkpoint dir (from the train CLI)")
    ap.add_argument("--save_dir", type=str, default="preds")
    ap.add_argument("--save_n", type=int, default=16)
    ap.add_argument("--save_every", type=int, default=0)
    ap.add_argument("--save_start", type=int, default=0)
    ap.add_argument("--save_indices", type=str, default="",
                    help="comma-separated indices; overrides save_every")
    ap.add_argument("--rescale_png", action="store_true")
    ap.add_argument("--ema", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="evaluate the EMA weights saved alongside the "
                         "checkpoint (--ema_decay at train time).  "
                         "Default (unset): auto — use the EMA subtree "
                         "when the checkpoint's meta records ema_decay, "
                         "since EMA-trained best checkpoints were "
                         "SELECTED by EMA-weight validation; --no-ema "
                         "forces the raw params")
    ap.add_argument("--self_ensemble", action="store_true",
                    help="x8 geometric TTA (rot90 x flips, averaged) — "
                         "~8x inference cost for typically +0.1-0.2 dB")
    ap.add_argument("--tile", type=int, default=0,
                    help="tile size for tiled inference (0 = whole image).  "
                         "Recommended production setting (measured on v5e at "
                         "1024^2 LR, PARITY.md): --tile 192 --tile_overlap 16 "
                         "--tile_batch 8")
    ap.add_argument("--tile_overlap", type=int, default=16)
    ap.add_argument("--tile_batch", type=int, default=0,
                    help="max tiles per model call (0 = all in one batch); "
                         "bounds peak HBM at production whole-image sizes")
    ap.add_argument("--exact", action=argparse.BooleanOptionalAction, default=None,
                    help="reference-exact semantics: disable fused_reconstruct "
                         "and tanh-gelu approximations.  Default: ON for torch "
                         ".pt/.pth checkpoints (trained with the exact chain; "
                         "the fused border ring costs up to ~0.05 dB, PARITY.md "
                         "round 3) but OFF for framework checkpoints, which "
                         "evaluate with the semantics embedded in their config "
                         "— i.e. the semantics they were trained with")
    ap.add_argument("--no_baseline", action="store_true")
    ap.add_argument("--report_json", type=str, default="",
                    help="write the result dict (psnr/ssim/mpix_per_s) as "
                         "JSON to this path — lets orchestrators (e.g. the "
                         "quality-proof harness) run the eval in a fresh "
                         "subprocess and still read the numbers back")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard the tile batch across N mesh devices "
                         "(requires --tile)")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    report_devices()
    scale_int = int(args.scale[1:])

    if args.ckpt.endswith((".pt", ".pth")):
        # Reference torch checkpoint (e.g. the published best_X2.pt —
        # /root/reference/modules/evaluate.py:41-63 loads these):
        # convert in place and evaluate directly, no retraining needed.
        if args.ema:
            raise SystemExit("--ema applies to framework checkpoints only; "
                             "torch .pt/.pth files carry a single weight set "
                             "(use interop to inspect params_ema subtrees)")
        exact = True if args.exact is None else args.exact
        if exact:
            from tpu_superresolution_tpu.models import dat as _datmod

            _datmod.force_exact_chain()
        mcfg, variables = _load_torch_checkpoint(
            args.model, args.ckpt, scale_int, exact
        )
        model = build_model(mcfg)
        print(f"[ckpt] {args.ckpt}: torch->flax converted, model={mcfg.name} "
              f"(exact={exact})")
    else:
        from tpu_superresolution_tpu.train.checkpoint import (
            load_weights_only,
            model_config_from_checkpoint,
        )

        mcfg = model_config_from_checkpoint(args.ckpt)
        if mcfg is None:  # config-less checkpoint: default --model arch
            from tpu_superresolution_tpu import models as _models  # noqa: F401
            from tpu_superresolution_tpu.core.config import model_registry

            mcfg = model_registry[args.model][0](scale=scale_int)
        # Framework checkpoints are evaluated with the semantics they
        # were TRAINED with (the config embedded in the checkpoint): a
        # model trained through the fused-reconstruction path learns its
        # border behavior through that path, so forcing the exact chain
        # at eval time degrades borders (measured: 42.7 -> 31.6 dB on
        # 96-px images, PARITY.md round 3).  --exact still forces
        # reference-exact semantics for torch-weight comparisons.
        if args.exact:
            import dataclasses

            from tpu_superresolution_tpu.models import dat as _datmod

            _datmod.force_exact_chain()
            over = {
                k: v
                for k, v in (("fused_reconstruct", False), ("gelu_approximate", False))
                if hasattr(mcfg, k)
            }
            if over:
                mcfg = dataclasses.replace(mcfg, **over)
        model = build_model(mcfg)
        restored, meta = load_weights_only(args.ckpt)
        variables = {"params": restored["params"]}
        # --ema unset = auto: EMA-trained checkpoints record ema_decay in
        # meta.json and their best/bestpsnr selection ran on EMA-weight
        # validation — evaluating raw params would run weights that never
        # achieved the recorded val metrics (ADVICE r4).
        use_ema = args.ema
        if use_ema is None:
            use_ema = bool(meta.get("ema_decay"))
            if use_ema:
                print("[ckpt] meta records ema_decay="
                      f"{meta['ema_decay']} — defaulting to EMA weights "
                      "(--no-ema for raw params)")
        if use_ema:
            from tpu_superresolution_tpu.train.checkpoint import load_ema_params

            ema = load_ema_params(args.ckpt)
            if ema is None:
                raise SystemExit(f"--ema: no EMA subtree in {args.ckpt} "
                                 "(train with --ema_decay to record one)")
            variables["params"] = ema
            print("[ckpt] using EMA weights")
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        print(f"[ckpt] {args.ckpt}: model={mcfg.name} epoch={meta.get('epoch')}")

    convention = "native_lr" if mcfg.upsamples_internally else "pre_upscale"
    channels = mcfg.in_channels
    idx_te = PairedIndex(args.data_root, "test", args.scale)
    loader = Loader(
        idx_te, args.batch_size, grayscale=channels == 1, channels=channels,
        num_threads=resolve_workers(args.workers),
    )
    print(f"[data] test samples: {len(idx_te)} | steps: {len(loader)}")

    if not args.no_baseline:
        base = bicubic_baseline(loader, scale_int)
        print(f"[baseline] Bicubic PSNR: {base['psnr']:.2f} dB | SSIM: {base['ssim']:.4f}")

    save_indices = tuple(
        int(s) for s in args.save_indices.split(",") if s.strip()
    )
    ecfg = EvalConfig(
        batch_size=args.batch_size,
        tile_size=args.tile or None,
        tile_overlap=args.tile_overlap,
        max_tile_batch=args.tile_batch or None,
        save_n=args.save_n,
        save_every=args.save_every or None,
        save_start=args.save_start,
        save_indices=save_indices,
        rescale_png=args.rescale_png,
        self_ensemble=args.self_ensemble,
    )
    mesh = None
    if args.dp and args.dp > 1:
        if not args.tile:
            raise SystemExit("--dp requires --tile (sharded tiled inference)")
        from tpu_superresolution_tpu.parallel import make_mesh

        mesh = make_mesh(args.dp)
        print(f"[dp] sharded tiled inference over {args.dp} devices")
    ev = Evaluator(model, variables, scale_int, convention, ecfg, mesh=mesh)
    results = ev.run(loader, save_dir=args.save_dir if (args.save_n or args.save_every or save_indices) else None)
    print(f"[result] PSNR {results['psnr']:.2f} dB | SSIM {results['ssim']:.4f} | "
          f"{results['mpix_per_s']:.1f} MPix/s")
    if args.report_json:
        import json

        out = {}
        for k, v in results.items():
            try:
                out[k] = float(v)
            except (TypeError, ValueError):
                pass
        with open(args.report_json, "w") as f:
            json.dump(out, f)
        print(f"[report] result json -> {args.report_json}")
    return results


if __name__ == "__main__":
    main()

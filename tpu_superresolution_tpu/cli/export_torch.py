"""Export a framework (Orbax) checkpoint as a reference-format torch
.pt so reference users can consume framework-trained weights directly:

    python -m tpu_superresolution_tpu.cli.export_torch \\
        --ckpt runs/bestpsnr_X2 --out swinir_x2.pt

The written file is {'params': state_dict} — one of the wrapper forms
the reference's checkpoint unwrap accepts
(``/root/reference/modules/evaluate.py:139-145``).  Weight round trips
are bit-exact (tests/test_torch_export.py)."""

from __future__ import annotations

import argparse


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", type=str, required=True,
                    help="Orbax checkpoint dir (train CLI output; the "
                         "embedded config names the architecture)")
    ap.add_argument("--out", type=str, required=True,
                    help="output .pt path")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from tpu_superresolution_tpu.interop import save_torch_checkpoint
    from tpu_superresolution_tpu.train.checkpoint import (
        load_weights_only,
        model_config_from_checkpoint,
    )

    mcfg = model_config_from_checkpoint(args.ckpt)
    if mcfg is None:
        raise SystemExit(
            "checkpoint carries no model config — cannot infer the "
            "architecture to export"
        )
    restored, meta = load_weights_only(args.ckpt)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    path = save_torch_checkpoint(mcfg.name, variables, args.out)
    print(f"[export] {args.ckpt} (model={mcfg.name}, "
          f"epoch={meta.get('epoch')}) -> {path}")
    return path


if __name__ == "__main__":
    main()

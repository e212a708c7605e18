"""Orbax checkpointing: {params, batch_stats, opt_state, step} + config.

TPU equivalent of the reference's torch.save dicts
({model, opt, sched, epoch, args} — train.py:393-401): the model config
and run metadata ride along as JSON so a checkpoint is self-describing
(config_from_dict rebuilds the model).  Resume restores optimizer state
unless finetuning (train.py:335-342 semantics).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from tpu_superresolution_tpu.core.config import ModelConfig, config_from_dict


def save_checkpoint(
    path: str,
    state,
    model_config: Optional[ModelConfig] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    path = Path(path).absolute()
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats or {},
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr = ocp.StandardCheckpointer()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path / "state", tree)
    ckptr.wait_until_finished()
    if getattr(state, "ema_params", None) is not None:
        # EMA weights ride in their own subtree so checkpoints without
        # EMA keep the exact same layout (template restores unchanged);
        # consumers opt in via load_ema_params / evaluate --ema.
        ckptr.save(path / "ema", {"params": state.ema_params})
        ckptr.wait_until_finished()
    meta = dict(extra or {})
    if getattr(state, "ema_params", None) is not None:
        meta["ema_decay"] = float(getattr(state, "ema_decay", 0.0))
    if model_config is not None:
        meta["model_config"] = model_config.to_dict()
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f, indent=1, default=str)


def _restore_as_numpy(state_dir: Path):
    """Target-less restore to HOST numpy arrays.

    A checkpoint written on one topology records its device shardings;
    restoring it verbatim on a different backend (e.g. a TPU-trained
    checkpoint opened on CPU for evaluation) fails with
    'Device ... was not found in jax.local_devices()'.  Weights-only
    consumers don't care about the saved sharding — force every leaf to
    np.ndarray so checkpoints are portable across backends."""
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    tree_meta = ckptr.metadata(state_dir).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree_meta
    )
    return ckptr.restore(
        state_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args)
    )


def load_checkpoint(path: str, target_state=None):
    """Restore a checkpoint.  With target_state, returns a TrainState
    whose params/batch_stats/opt_state/step are replaced; otherwise
    returns the raw tree.  Second return: meta dict."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if target_state is not None:
        template = {
            "params": target_state.params,
            "batch_stats": target_state.batch_stats or {},
            "opt_state": target_state.opt_state,
            "step": target_state.step,
        }
        tree = ckptr.restore(path / "state", target=template)
    else:
        tree = _restore_as_numpy(path / "state")
    meta = {}
    meta_path = path / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    if target_state is not None:
        restored = target_state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
        )
        if getattr(target_state, "ema_params", None) is not None:
            # resume an EMA run: restore the saved EMA if the checkpoint
            # has one, else re-seed it from the restored params.  The
            # re-seed must be a COPY, never an alias: make_train_step
            # donates the whole state (donate_argnums=(0,)), and aliased
            # params/ema_params buffers would be donated twice on the
            # first resumed TPU step — the exact hazard
            # create_train_state avoids with copy=True.
            ema = load_ema_params(path)
            if ema is None:
                import jax
                import jax.numpy as jnp

                ema = jax.tree.map(
                    lambda p: jnp.array(p, copy=True), tree["params"]
                )
            restored = restored.replace(ema_params=ema)
        return restored, meta
    return tree, meta


def load_ema_params(path: str):
    """EMA weights saved alongside a checkpoint (save_checkpoint writes
    them under <ckpt>/ema when TrainState.ema_params is enabled).
    Returns None when the checkpoint has no EMA subtree.  Host-numpy
    restore for backend portability, like _restore_as_numpy."""
    ema_dir = Path(path).absolute() / "ema"
    if not ema_dir.exists():
        return None
    return _restore_as_numpy(ema_dir)["params"]


def load_weights_only(path: str):
    """Finetune-mode restore: params (+batch_stats) only, optimizer
    fresh (reference --finetune, train.py:283-301).

    When the checkpoint's meta carries a model config, an abstract
    target tree is built via jax.eval_shape so Orbax restores against a
    verified structure (no target-less UNSAFE path)."""
    tree, meta = load_checkpoint(path)
    restored = {
        "params": tree["params"],
        "batch_stats": tree.get("batch_stats", {}),
    }
    cfg = model_config_from_checkpoint(path)
    if cfg is not None:
        # Validate the restored structure against the config's abstract
        # init (jax.eval_shape: no compute) — a wrong-architecture
        # checkpoint fails HERE with a clear message instead of deep
        # inside apply().
        from tpu_superresolution_tpu.core.config import build_model

        model = build_model(cfg)
        x = jnp.zeros((1, 64, 64, cfg.in_channels), jnp.float32)
        abstract = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x, train=False)
        )
        import jax.tree_util as jtu

        if jtu.tree_structure(abstract["params"]) != jtu.tree_structure(
            restored["params"]
        ):
            raise ValueError(
                f"checkpoint params structure does not match model config "
                f"'{cfg.name}' at {path}"
            )
        # Structure equality is not enough: a same-family different-width
        # checkpoint has the identical tree but wrong leaf shapes and
        # would explode deep inside apply().  Compare every leaf's
        # shape/dtype and name the first mismatching path.
        abs_leaves = jtu.tree_leaves_with_path(abstract["params"])
        got_leaves = jtu.tree_leaves_with_path(restored["params"])
        for (p_abs, a), (_, g) in zip(abs_leaves, got_leaves):
            g_shape = tuple(getattr(g, "shape", ()))
            g_dtype = getattr(g, "dtype", None)
            if tuple(a.shape) != g_shape or (
                g_dtype is not None and a.dtype != g_dtype
            ):
                raise ValueError(
                    f"checkpoint param {jtu.keystr(p_abs)} has shape "
                    f"{g_shape}/{g_dtype}, model config '{cfg.name}' expects "
                    f"{tuple(a.shape)}/{a.dtype} (at {path})"
                )
    return restored, meta


def model_config_from_checkpoint(path: str) -> Optional[ModelConfig]:
    meta_path = Path(path).absolute() / "meta.json"
    if not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text())
    if "model_config" in meta:
        return config_from_dict(meta["model_config"])
    return None

"""Unified training engine — ONE jit'd train step for every model family.

The reference duplicates its engine per entry point (train_one_epoch in
train.py:89-137 AND finetune_swinir.py:148-179, validate twice, loaders
twice); here a single Trainer covers train / finetune / resume for all
five models.

TPU-native design:
- The train step is one XLA program: on-device paired augmentation
  (crop/flip/bicubic — data/transforms.py) -> bf16 forward -> fp32 loss
  -> backward -> global-norm clip 1.0 (train.py:119) -> optax AdamW with
  schedule -> metric accumulation.  Host touches one scalar per epoch,
  not per step (the reference syncs loss.item() every batch).
- bf16 compute / fp32 params, no GradScaler (the reference's bf16
  finetune path already disabled scaling — finetune_swinir.py:311).
- Donated state: params/opt_state update in place in HBM.
- Fail-fast finite guards mirrored from train.py:110-113 /
  finetune_swinir.py:133-143 as a jnp.isfinite check folded into the
  epoch-mean fetch (raises on host at epoch end; optional per-step).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_superresolution_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from tpu_superresolution_tpu.data.transforms import (
    make_eval_batch_preupscale,
    make_train_batch_native,
    make_train_batch_preupscale,
)
from tpu_superresolution_tpu.ops.metrics import batch_psnr, ssim
from tpu_superresolution_tpu.train.freeze import apply_freeze, freeze_mask
from tpu_superresolution_tpu.train.losses import get_loss
from tpu_superresolution_tpu.train.schedules import build_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # {} for BN-free models
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # Exponential moving average of params (None = EMA off).  Standard
    # SR-training practice (BasicSR-style ema_decay 0.999) the reference
    # lacks; validation and best-checkpoint selection use the EMA
    # weights when enabled, and checkpoints carry them alongside the
    # raw params (train/checkpoint.py).
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            # runs inside both the single-device and the shard_map DP
            # steps: grads are psummed before apply, so the EMA stays
            # bitwise replicated across shards
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )

    @property
    def eval_params(self):
        """The weights validation/checkpoint-selection should score:
        EMA when enabled, live params otherwise."""
        return self.params if self.ema_params is None else self.ema_params


def build_optimizer(
    tcfg: TrainConfig, steps_per_epoch: int, params
) -> optax.GradientTransformation:
    lr = tcfg.ft_lr if (tcfg.finetune and tcfg.ft_lr is not None) else tcfg.lr
    schedule = build_schedule(
        tcfg.scheduler, lr, tcfg.epochs, steps_per_epoch, tcfg.min_lr
    )
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip_norm)
        if tcfg.grad_clip_norm
        else optax.identity(),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay),
    )
    if tcfg.finetune and tcfg.freeze_regex:
        tx = apply_freeze(tx, freeze_mask(params, tcfg.freeze_regex))
    return tx


def create_train_state(
    model, params, batch_stats, tx, ema_decay: Optional[float] = None
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats or {},
        opt_state=tx.init(params),
        tx=tx,
        # real copies, not aliases: the jit'd step donates the state, and
        # params/ema sharing buffers would be a double-donation error
        ema_params=(
            jax.tree.map(lambda p: jnp.array(p, copy=True), params)
            if ema_decay
            else None
        ),
        ema_decay=float(ema_decay or 0.0),
    )


def _apply_model(model, state: TrainState, x, train: bool, rngs=None):
    variables = {"params": state.params}
    has_bn = bool(state.batch_stats)
    if has_bn:
        variables["batch_stats"] = state.batch_stats
    kwargs = {"rngs": rngs} if (train and rngs) else {}
    if train and has_bn:
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"], **kwargs
        )
        return out, mutated["batch_stats"]
    out = model.apply(variables, x, train=train, **kwargs)
    return out, state.batch_stats


def make_aug(
    convention: str,
    scale: int,
    patch: Optional[int],
    do_flips: bool,
    do_blur: bool = False,
    norm: Optional[Tuple[float, float]] = None,
):
    """Shared on-device augmentation pipeline builder (single-device and
    data-parallel steps use the same one)."""
    from tpu_superresolution_tpu.data.transforms import (
        normalize,
        pre_upscale_batch,
    )

    def aug(lr, hr, key):
        if convention == "pre_upscale":
            if patch is not None:
                lr2, hr2 = make_train_batch_preupscale(
                    lr, hr, key, scale, patch, do_flips, do_blur
                )
            else:
                lr2, hr2 = pre_upscale_batch(lr, scale), hr
        elif convention == "native_lr":
            if patch is None:
                lr2, hr2 = lr, hr
            else:
                lr2, hr2 = make_train_batch_native(
                    lr, hr, key, scale, patch, do_flips, do_blur
                )
        else:
            raise ValueError(convention)
        if norm is not None:
            lr2 = normalize(lr2, *norm)
            hr2 = normalize(hr2, *norm)
        return lr2, hr2

    return aug


def make_train_step(
    model,
    loss_name: str,
    convention: str,
    scale: int,
    patch: Optional[int],
    do_flips: bool,
    do_blur: bool = False,
    norm: Optional[Tuple[float, float]] = None,
):
    """Returns jit'd step(state, lr_raw, hr_raw, key) -> (state, metrics).

    Augmentation is fused into the step: raw decoded batches go in, the
    whole pipeline runs as one XLA program on device.  `do_blur`/`norm`
    wire the notebook's extended aug (cnn.ipynb cell 22): paired blur,
    and (mean, std) normalization of both pair members.
    """
    loss_fn = get_loss(loss_name)
    aug = make_aug(convention, scale, patch, do_flips, do_blur, norm)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, lr_raw, hr_raw, key):
        aug_key, dp_key = jax.random.split(key)
        lr, hr = aug(lr_raw, hr_raw, aug_key)

        def compute_loss(params):
            st = state.replace(params=params)
            out, new_stats = _apply_model(
                model, st, lr, train=True, rngs={"drop_path": dp_key}
            )
            out = out.astype(jnp.float32)
            loss = loss_fn(out, hr)
            return loss, (out, new_stats)

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "psnr": batch_psnr(out, hr).mean(),
            "finite": jnp.isfinite(loss) & jnp.isfinite(gnorm),
        }
        return state, metrics

    return step


def make_eval_step(
    model,
    loss_name: str,
    convention: str,
    scale: int,
    norm: Optional[Tuple[float, float]] = None,
):
    """jit'd eval step: full-image, loss + per-image PSNR/SSIM sums
    (reference validate, train.py:140-179)."""
    loss_fn = get_loss(loss_name)

    @jax.jit
    def step(state: TrainState, lr_raw, hr_raw):
        lr = (
            make_eval_batch_preupscale(lr_raw, scale)
            if convention == "pre_upscale"
            else lr_raw
        )
        # nan_to_num input scrub (train.py:157-158)
        lr = jnp.nan_to_num(lr, nan=0.0, posinf=0.0, neginf=0.0)
        hr = jnp.nan_to_num(hr_raw, nan=0.0, posinf=0.0, neginf=0.0)
        if norm is not None:
            from tpu_superresolution_tpu.data.transforms import normalize

            lr = normalize(lr, *norm)
            hr = normalize(hr, *norm)
        out, _ = _apply_model(model, state, lr, train=False)
        out = out.astype(jnp.float32)
        loss = loss_fn(out, hr)
        p01 = jnp.clip(out, 0.0, 1.0)
        t01 = jnp.clip(hr, 0.0, 1.0)
        return {
            "loss": loss,
            "psnr_sum": batch_psnr(out, hr).sum(),
            "ssim_sum": ssim(p01, t01) * lr.shape[0],
            "n": jnp.asarray(lr_raw.shape[0], jnp.float32),
        }

    return step


@dataclass
class Trainer:
    """Full training orchestration: epochs, validation, best-checkpoint
    tracking (dual best by val-loss AND val-PSNR, finetune_swinir.py:
    344-371), ETA logging, loss-curve artifact (train.py:403-419)."""

    model: Any
    model_config: ModelConfig
    data_config: DataConfig
    train_config: TrainConfig
    workdir: str = "."
    log: Callable[[str], None] = print
    # chrome-trace timeline path (utils/trace.py) — per-epoch train/val
    # spans + loss/PSNR counters; the tunnel-safe profiling artifact
    # (XPlane hangs over the axon tunnel).  None = off.
    trace_path: Optional[str] = None

    history: Dict[str, list] = field(default_factory=lambda: {"train": [], "val": []})
    best_val_loss: float = math.inf
    best_val_psnr: float = -math.inf
    _no_improve: int = 0

    def fit(self, state: TrainState, train_loader, valid_loader, rng_key=None):
        tcfg = self.train_config
        dcfg = self.data_config
        key = rng_key if rng_key is not None else jax.random.key(tcfg.seed)

        convention = dcfg.convention
        patch = dcfg.patch_size if convention == "pre_upscale" else dcfg.lr_patch
        norm = (dcfg.norm_mean, dcfg.norm_std) if dcfg.normalizes else None

        # Data parallelism: dp_shards > 1 switches to the shard_map+psum
        # steps over a device mesh; batches are sharded along axis 0.
        # -1 = auto: use every local device.
        dp = tcfg.dp_shards
        if dp == -1:
            dp = jax.device_count()
        dp = dp if dp and dp > 1 else 0
        shard = lambda t: t
        if dp:
            from tpu_superresolution_tpu.parallel import (
                make_dp_eval_step,
                make_dp_train_step,
                make_mesh,
                replicate,
                shard_batch,
            )

            mesh = make_mesh(dp)
            state = replicate(state, mesh)
            train_step = make_dp_train_step(
                self.model, tcfg.loss, convention, dcfg.scale_int, patch,
                dcfg.do_flips, mesh, do_blur=dcfg.do_blur, norm=norm,
            )
            dp_eval = make_dp_eval_step(
                self.model, tcfg.loss, convention, dcfg.scale_int, mesh,
                norm=norm,
            )
            # ragged val batches (not divisible by dp) fall back to the
            # single-device eval step — no data is skipped.
            single_eval = make_eval_step(
                self.model, tcfg.loss, convention, dcfg.scale_int, norm=norm
            )

            def eval_step(st, lr, hr):
                if lr.shape[0] % dp:
                    return single_eval(st, lr, hr)
                return dict(dp_eval(st, *shard((lr, hr))))

            shard = lambda t: shard_batch(t, mesh)
            self.log(f"[dp] data-parallel over {dp} devices (shard_map + psum)")
        else:
            train_step = make_train_step(
                self.model,
                tcfg.loss,
                convention,
                dcfg.scale_int,
                patch,
                dcfg.do_flips,
                do_blur=dcfg.do_blur,
                norm=norm,
            )
            eval_step = make_eval_step(
                self.model, tcfg.loss, convention, dcfg.scale_int, norm=norm
            )

        rec = None
        if self.trace_path:
            from tpu_superresolution_tpu.utils.trace import TraceRecorder

            rec = TraceRecorder()

        t_start = time.time()
        for epoch in range(1, tcfg.epochs + 1):
            ep_t0 = rec.elapsed_s if rec else 0.0
            t_ep = time.time()
            # ---- train ----
            losses = []
            data_t = step_t = 0.0
            end = time.time()
            for lr_np, hr_np in train_loader:
                data_t += time.time() - end
                t0 = time.time()
                key, sub = jax.random.split(key)
                if dp:
                    # Ragged batches are padded to a device multiple by
                    # wrapping real samples; the pads carry weight 0 so
                    # loss/grads/metrics are exact — no batch is dropped.
                    n = lr_np.shape[0]
                    pad = (-n) % dp
                    w = np.ones((n + pad,), np.float32)
                    if pad:
                        idx = np.arange(n + pad) % n
                        lr_np = np.asarray(lr_np)[idx]
                        hr_np = np.asarray(hr_np)[idx]
                        w[n:] = 0.0
                    lr_b, hr_b, w_b = shard(
                        (jnp.asarray(lr_np), jnp.asarray(hr_np), jnp.asarray(w))
                    )
                    state, metrics = train_step(state, lr_b, hr_b, sub, w_b)
                else:
                    lr_b, hr_b = jnp.asarray(lr_np), jnp.asarray(hr_np)
                    state, metrics = train_step(state, lr_b, hr_b, sub)
                losses.append(metrics["loss"])
                step_t += time.time() - t0
                if tcfg.time_log_every and len(losses) % tcfg.time_log_every == 0:
                    n_done = len(losses)
                    self.log(
                        f"[{dcfg.scale}][time] batch {n_done}: "
                        f"data {data_t / n_done:.3f}s/b step {step_t / n_done:.3f}s/b"
                    )
                end = time.time()
            n_steps = max(1, len(losses))
            tr_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
            if not math.isfinite(tr_loss):
                raise RuntimeError(
                    "Model produced NaN/Inf loss — lower max_lr / check init"
                )
            t_tr = time.time() - t_ep
            if rec:
                rec.complete(
                    f"epoch {epoch}", ep_t0, t_tr, track="train",
                    loss=tr_loss, data_s_per_batch=data_t / n_steps,
                    step_s_per_batch=step_t / n_steps,
                )
                rec.counter("train_loss", tr_loss)

            # ---- validate (every val_every epochs; always the last) ----
            do_val = (
                getattr(tcfg, "val_every", 1) <= 1
                or epoch % tcfg.val_every == 0
                or epoch == tcfg.epochs
            )
            self.history["train"].append(tr_loss)
            if not do_val:
                self.history["val"].append(None)
                self.log(
                    f"[{dcfg.scale}] epoch {epoch}: "
                    f"train_loss {tr_loss:.7f} | "
                    f"(data {data_t / n_steps:.3f}/batch {step_t / n_steps:.3f}) | "
                    f"time: train {t_tr:.1f}s (val skipped)"
                )
                continue
            t_val0 = time.time()
            agg = {"loss": 0.0, "psnr_sum": 0.0, "ssim_sum": 0.0, "n": 0.0}
            n_batches = 0
            # validate with the EMA weights when enabled (they are what
            # the checkpoint's consumers will run)
            eval_state = (
                state
                if state.ema_params is None
                else state.replace(params=state.ema_params)
            )
            for lr_np, hr_np in valid_loader:
                m = eval_step(eval_state, jnp.asarray(lr_np), jnp.asarray(hr_np))
                agg["loss"] += float(m["loss"])
                agg["psnr_sum"] += float(m["psnr_sum"])
                agg["ssim_sum"] += float(m["ssim_sum"])
                agg["n"] += float(m["n"])
                n_batches += 1
            val_loss = agg["loss"] / max(1, n_batches)
            val_psnr = agg["psnr_sum"] / max(1.0, agg["n"])
            val_ssim = agg["ssim_sum"] / max(1.0, agg["n"])
            t_val = time.time() - t_val0
            if rec:
                rec.complete(
                    f"val {epoch}", rec.elapsed_s - t_val, t_val,
                    track="val", loss=val_loss, psnr=val_psnr,
                    ssim=val_ssim,
                )
                rec.counter("val_psnr", val_psnr)

            self.history["val"].append(val_loss)

            self.log(
                f"[{dcfg.scale}] epoch {epoch}: "
                f"train_loss {tr_loss:.7f}, val_loss {val_loss:.7f} | "
                f"val_PSNR {val_psnr:.2f} dB, val_SSIM {val_ssim:.4f} | "
                f"(data {data_t / n_steps:.3f}/batch {step_t / n_steps:.3f}) | "
                f"time: train {t_tr:.1f}s, val {t_val:.1f}s"
            )
            elapsed = time.time() - t_start
            eta = elapsed / epoch * (tcfg.epochs - epoch)
            self.log(f"[{dcfg.scale}][time] elapsed={elapsed:.0f}s ETA~{eta:.0f}s")

            # ---- checkpoints ----
            from tpu_superresolution_tpu.train.checkpoint import save_checkpoint

            improved = val_loss < self.best_val_loss
            if improved:
                self.best_val_loss = val_loss
                save_checkpoint(
                    f"{self.workdir}/best_{dcfg.scale}",
                    state,
                    self.model_config,
                    extra={
                        "epoch": epoch,
                        "best_val_loss": val_loss,
                        "val_psnr": val_psnr,
                    },
                )
                self.log(f"[ckpt] saved best_{dcfg.scale} (val_loss {val_loss:.7f})")
            if val_psnr > self.best_val_psnr:
                self.best_val_psnr = val_psnr
                save_checkpoint(
                    f"{self.workdir}/bestpsnr_{dcfg.scale}",
                    state,
                    self.model_config,
                    extra={"epoch": epoch, "best_val_psnr": val_psnr, "val_loss": val_loss},
                )

            # ---- early stopping (lost reference CLI's
            # --early_stop_patience, common_commands.txt:5-6) ----
            self._no_improve = 0 if improved else self._no_improve + 1
            if (
                tcfg.early_stop_patience
                and self._no_improve >= tcfg.early_stop_patience
            ):
                self.log(
                    f"[early_stop] no val-loss improvement for "
                    f"{self._no_improve} epochs (patience "
                    f"{tcfg.early_stop_patience}) — stopping at epoch {epoch}"
                )
                break

        self.save_loss_curve(f"{self.workdir}/loss_curve_{dcfg.scale}.png")
        self.save_run_report(f"{self.workdir}/run_{dcfg.scale}.json")
        if rec:
            rec.save(self.trace_path)
            self.log(f"[trace] saved chrome-trace timeline to {self.trace_path}")
        return state

    def save_run_report(self, path: str):
        """Machine-readable experiment record (replaces the reference's
        manual markdown log in results.ipynb): configs + per-epoch
        history + bests."""
        import dataclasses
        import json

        report = {
            "model_config": self.model_config.to_dict(),
            "data_config": dataclasses.asdict(self.data_config),
            "train_config": dataclasses.asdict(self.train_config),
            "history": self.history,
            "best_val_loss": self.best_val_loss,
            "best_val_psnr": self.best_val_psnr,
        }
        with open(path, "w") as f:
            json.dump(report, f, indent=1, default=str)
        self.log(f"[report] saved run report to {path}")

    def save_loss_curve(self, path: str):
        """Loss-curve PNG artifact (reference train.py:403-419)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        epochs = list(range(1, len(self.history["train"]) + 1))
        plt.figure(figsize=(8, 5))
        plt.plot(epochs, self.history["train"], label="train loss")
        # val_every>1 leaves None at skipped epochs — plot only the
        # validated points so the curve connects across gaps.
        vpts = [
            (e, v)
            for e, v in zip(epochs, self.history["val"])
            if v is not None
        ]
        if vpts:
            plt.plot(*zip(*vpts), label="val loss")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.title(f"Train vs Val loss ({self.data_config.scale})")
        plt.grid(True)
        plt.legend()
        plt.tight_layout()
        plt.savefig(path, dpi=150)
        plt.close()
        self.log(f"[plot] saved loss curves to {path}")

"""Data-parallel train/eval steps via shard_map + ICI psum.

Each device runs the full per-shard step (on-device aug -> fwd -> bwd)
on its batch shard; gradients and metrics are all-reduced with
`jax.lax.psum` over the mesh axis — the collective rides ICI, inserted
exactly once per step.  Params/opt state are replicated; the optimizer
update runs identically on every device on the psum'd gradients, so
replicas stay bit-identical without a broadcast.

(BASELINE.json config #5 infrastructure; no reference counterpart —
SURVEY.md §2.4.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_superresolution_tpu.data.transforms import (
    make_eval_batch_preupscale,
    make_train_batch_native,
    make_train_batch_preupscale,
)
from tpu_superresolution_tpu.ops.metrics import batch_psnr
from tpu_superresolution_tpu.train.engine import TrainState, _apply_model
from tpu_superresolution_tpu.train.losses import get_loss


def make_dp_train_step(
    model,
    loss_name: str,
    convention: str,
    scale: int,
    patch: Optional[int],
    do_flips: bool,
    mesh: Mesh,
    axis_name: str = "dp",
):
    """jit(shard_map) data-parallel train step.

    state: replicated; lr_raw/hr_raw: batch-sharded along axis 0; key:
    replicated (folded with the device index for independent aug).
    """
    loss_fn = get_loss(loss_name)

    def aug(lr, hr, key):
        if convention == "pre_upscale":
            if patch is not None:
                return make_train_batch_preupscale(lr, hr, key, scale, patch, do_flips)
            from tpu_superresolution_tpu.data.transforms import pre_upscale_batch

            return pre_upscale_batch(lr, scale), hr
        if patch is None:
            return lr, hr
        return make_train_batch_native(lr, hr, key, scale, patch, do_flips)

    def per_shard(state: TrainState, lr_raw, hr_raw, key):
        # independent augmentation stream per device
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        lr, hr = aug(lr_raw, hr_raw, key)

        def compute_loss(params):
            st = state.replace(params=params)
            out, new_stats = _apply_model(model, st, lr, train=True)
            out = out.astype(jnp.float32)
            return loss_fn(out, hr), (out, new_stats)

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        # ---- ICI collectives: grad + metric all-reduce ----
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        psnr = jax.lax.pmean(batch_psnr(out, hr).mean(), axis_name)
        if new_stats:
            new_stats = jax.lax.pmean(new_stats, axis_name)

        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics = {"loss": loss, "grad_norm": gnorm, "psnr": psnr}
        return state, metrics

    state_spec = P()  # replicated
    mapped = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(state_spec, P(axis_name), P(axis_name), state_spec),
        out_specs=(state_spec, state_spec),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_dp_eval_step(
    model,
    loss_name: str,
    convention: str,
    scale: int,
    mesh: Mesh,
    axis_name: str = "dp",
):
    loss_fn = get_loss(loss_name)

    def per_shard(state: TrainState, lr_raw, hr_raw):
        lr = (
            make_eval_batch_preupscale(lr_raw, scale)
            if convention == "pre_upscale"
            else lr_raw
        )
        out, _ = _apply_model(model, state, lr, train=False)
        out = out.astype(jnp.float32)
        loss = jax.lax.pmean(loss_fn(out, hr_raw), axis_name)
        psnr_sum = jax.lax.psum(batch_psnr(out, hr_raw).sum(), axis_name)
        n = jax.lax.psum(jnp.asarray(lr_raw.shape[0], jnp.float32), axis_name)
        return {"loss": loss, "psnr_sum": psnr_sum, "n": n}

    mapped = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
    )
    return jax.jit(mapped)

"""Tiled whole-image inference with overlap blending — one jit'd program
per (image size, tile grid).

The SR-domain "context parallelism" (SURVEY.md §2.4/§5): the reference
bounds attention cost with window partitioning and reflect-pads whole
images (network_swinir.py:783-788), evaluating full images in one go;
at TPU production sizes the idiomatic formulation is a static tile grid:

- tile positions are numpy trace-time constants (final tiles clamp to
  the image edge, overlapping their neighbor — no ragged tiles, no
  dynamic shapes);
- all tiles stack into ONE batched forward [B*nT, t, t, C] — MXU-dense,
  one compile per grid;
- overlap blending = unrolled at[].add scatter + precomputed weight-map
  divide (uniform weights, matching the official SwinIR tiling recipe).

Models that upsample internally (SwinIR/HAT/DAT) tile in LR space with
output scale s; restoration models (MS_ResUNet/UNet2D, pre-upscaled
inputs) tile in HR space with s=1.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def tile_grid(size: int, tile: int, overlap: int) -> Tuple[int, ...]:
    """1-D tile start offsets with `overlap` shared pixels per seam; the
    last tile is clamped flush to the edge."""
    if tile >= size:
        return (0,)
    stride = tile - overlap
    if stride <= 0:
        raise ValueError(f"overlap {overlap} >= tile {tile}")
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    # clamping can duplicate the last start
    out: List[int] = []
    for s in starts:
        if not out or s > out[-1]:
            out.append(s)
    return tuple(out)


def tiled_forward(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    scale: int,
    tile: int,
    overlap: int,
    max_tile_batch: Optional[int] = None,
) -> jnp.ndarray:
    """apply_fn: [N, t, t, C] -> [N, t*s, t*s, C] batched tile forward.
    x: [B, H, W, C] inputs.  Returns [B, H*s, W*s, C].

    Call under jit (shapes static); compiles once per (H, W, grid).

    `max_tile_batch` bounds peak HBM at production whole-image sizes
    (the reference evaluates 500x500 whole images —
    modules/evaluate.py:165-195; a 2048^2 LR at tile 64 is ~1369 tiles,
    which as ONE batch would blow a chip's HBM): the tile batch is
    processed in fixed-size chunks, every chunk the same static shape
    (last chunk padded by wrapping), so the model subgraph compiles once
    and XLA frees/reuses chunk buffers sequentially.
    """
    b, h, w, c = x.shape
    # The effective tile is clamped by the SHORT edge; the grids must
    # use the clamped size too, or a long-and-narrow image (short edge
    # < tile <= long edge) leaves uncovered strips between tile starts
    # (zero blend weight -> NaN).
    t = min(tile, h, w)
    # overlap is clamped only when the tile itself was clamped by a
    # short image edge (the narrow-image fix); a user-supplied
    # overlap >= tile still surfaces tile_grid's ValueError.
    ov = (min(overlap, t - 1) if t > 1 else 0) if t < tile else overlap
    ys = tile_grid(h, t, ov)
    xs = tile_grid(w, t, ov)

    if len(ys) == 1 and len(xs) == 1 and t >= max(h, w):
        return apply_fn(x)

    # ---- gather tiles into one batch ----
    tiles = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(x[:, y0 : y0 + t, x0 : x0 + t, :])
    batch = jnp.concatenate(tiles, axis=0)  # [nT*B, t, t, C]

    n_total = batch.shape[0]
    if max_tile_batch is not None and 0 < max_tile_batch < n_total:
        mtb = max_tile_batch
        pad = (-n_total) % mtb
        if pad:
            batch = jnp.concatenate([batch, batch[:pad]], axis=0)
        chunks = [
            apply_fn(batch[i : i + mtb]) for i in range(0, batch.shape[0], mtb)
        ]
        out_tiles = jnp.concatenate(chunks, axis=0)[:n_total]
    else:
        out_tiles = apply_fn(batch)  # [nT*B, t*s, t*s, C]
    ts = t * scale

    # ---- scatter-add with uniform blend weights ----
    out = jnp.zeros((b, h * scale, w * scale, c), out_tiles.dtype)
    wmap = np.zeros((h * scale, w * scale, 1), np.float32)
    i = 0
    for y0 in ys:
        for x0 in xs:
            piece = out_tiles[i * b : (i + 1) * b]
            out = out.at[:, y0 * scale : y0 * scale + ts, x0 * scale : x0 * scale + ts, :].add(
                piece
            )
            wmap[y0 * scale : y0 * scale + ts, x0 * scale : x0 * scale + ts, :] += 1.0
            i += 1
    return out / jnp.asarray(wmap, out_tiles.dtype)[None]


def make_tiled_apply(
    model,
    variables,
    scale: int,
    tile: int,
    overlap: int,
):
    """jit'd whole-image SR function with tiling baked in."""

    def tile_fn(batch):
        return model.apply(variables, batch, train=False)

    @jax.jit
    def run(x):
        return tiled_forward(tile_fn, x, scale, tile, overlap)

    return run


def sharded_tiled_forward(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    scale: int,
    tile: int,
    overlap: int,
    mesh,
    axis_name: str = "dp",
    max_tile_batch: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-chip tiled inference: the spatial domain sharded across the
    mesh (SURVEY.md §2.4's SR-domain context parallelism).

    The tile batch [nT*B, t, t, C] is partitioned across devices along
    the tile axis; each chip runs its tile shard through the model; the
    outputs are all-gathered over ICI and blended on every chip (the
    blend is cheap relative to the model).  Tiles are padded to a
    multiple of the mesh size with dummy tiles that are dropped after
    the gather — shapes stay static for any grid.

    `max_tile_batch` bounds each chip's PER-CALL tile batch (the same
    HBM bound as tiled_forward's, applied per shard): the local shard
    runs in fixed-size chunks of that many tiles (last chunk padded by
    wrapping), so one model subgraph compiles and buffers are reused
    sequentially.

    Call under jit with `mesh` bound (the returned fn is already jit'd
    by make_sharded_tiled_apply).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    b, h, w, c = x.shape
    # clamped-tile grids: see tiled_forward (NaN strips otherwise)
    t = min(tile, h, w)
    # overlap is clamped only when the tile itself was clamped by a
    # short image edge (the narrow-image fix); a user-supplied
    # overlap >= tile still surfaces tile_grid's ValueError.
    ov = (min(overlap, t - 1) if t > 1 else 0) if t < tile else overlap
    ys = tile_grid(h, t, ov)
    xs = tile_grid(w, t, ov)
    n_dev = mesh.shape[axis_name]

    tiles = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(x[:, y0 : y0 + t, x0 : x0 + t, :])
    batch = jnp.concatenate(tiles, axis=0)  # [nT*B, t, t, C]
    n_tiles = batch.shape[0]
    pad = (-n_tiles) % n_dev
    if pad:
        batch = jnp.concatenate([batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)])

    def per_shard(shard):
        s_n = shard.shape[0]
        if max_tile_batch is not None and 0 < max_tile_batch < s_n:
            mtb = max_tile_batch
            p2 = (-s_n) % mtb
            if p2:
                shard = jnp.concatenate([shard, shard[:p2]], axis=0)
            out = jnp.concatenate(
                [apply_fn(shard[i : i + mtb])
                 for i in range(0, shard.shape[0], mtb)],
                axis=0,
            )[:s_n]
        else:
            out = apply_fn(shard)
        return jax.lax.all_gather(out, axis_name, axis=0, tiled=True)

    out_tiles = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(),
        check_vma=False,  # all_gather output IS replicated; checker can't infer it
    )(batch)
    out_tiles = out_tiles[:n_tiles]

    ts = t * scale
    out = jnp.zeros((b, h * scale, w * scale, c), out_tiles.dtype)
    wmap = np.zeros((h * scale, w * scale, 1), np.float32)
    i = 0
    for y0 in ys:
        for x0 in xs:
            piece = out_tiles[i * b : (i + 1) * b]
            out = out.at[:, y0 * scale : y0 * scale + ts, x0 * scale : x0 * scale + ts, :].add(
                piece
            )
            wmap[y0 * scale : y0 * scale + ts, x0 * scale : x0 * scale + ts, :] += 1.0
            i += 1
    return out / jnp.asarray(wmap, out_tiles.dtype)[None]


def make_sharded_tiled_apply(
    model, variables, scale, tile, overlap, mesh, max_tile_batch=None
):
    """jit'd multi-chip whole-image SR function."""

    def tile_fn(batch):
        return model.apply(variables, batch, train=False)

    @jax.jit
    def run(x):
        return sharded_tiled_forward(
            tile_fn, x, scale, tile, overlap, mesh,
            max_tile_batch=max_tile_batch,
        )

    return run

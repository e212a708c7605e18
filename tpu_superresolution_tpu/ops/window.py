"""Window partition / reverse / shift for NHWC feature maps.

The reference defines these twice (network_swinir.py:33-62 and
hat_arch.py:98-127); here they're shared.  All shapes are static inside
jit — the pure reshape/transpose formulation lets XLA fuse them into the
surrounding attention; a fused Pallas roll+partition+attend kernel lives
in ops/pallas/window_attention.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, ws*ws, C]; H, W must divide by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nH*nW, ws*ws, C] -> [B, H, W, C]."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """torch.roll(x, (-s, -s), dims=(1, 2)) equivalent on NHWC."""
    if shift == 0:
        return x
    return jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))


def cyclic_unshift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    if shift == 0:
        return x
    return jnp.roll(x, shift=(shift, shift), axis=(1, 2))


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Shifted-window attention mask, [nW, ws*ws, ws*ws] with 0 / -100.

    Equivalent to SwinIR's calculate_mask (network_swinir.py:216-237) but
    computed with numpy at trace time: (h, w, ws, shift) are always
    static in this framework (the tiling layer guarantees fixed tile
    sizes — SURVEY.md §7 hard part #1), so the mask is a jit constant.
    """
    if shift == 0:
        n_windows = (h // ws) * (w // ws)
        return np.zeros((n_windows, ws * ws, ws * ws), dtype=np.float32)
    img_mask = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    # partition into windows
    m = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def rect_window_partition(x: jnp.ndarray, hsp: int, wsp: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, hsp*wsp, C] rectangular windows (DAT's
    img2windows, dat_arch.py:15-23; same enumeration as the square
    partition, window shape hsp x wsp)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // hsp, hsp, w // wsp, wsp, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, hsp * wsp, c)


def rect_window_reverse(windows: jnp.ndarray, hsp: int, wsp: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of rect_window_partition -> [B, H, W, C]."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // hsp) * (w // wsp))
    x = windows.reshape(b, h // hsp, w // wsp, hsp, wsp, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def rect_shift_region_ids(
    h: int, w: int, hsp: int, wsp: int, sh: int, sw: int
) -> np.ndarray:
    """Per-token region labels behind the shifted rect-window mask
    (DAT's calculate_mask img_mask, dat_arch.py:318-344).  Returns
    [nW, hsp*wsp] int32; tokens attend iff labels match.  256x smaller
    than the [nW, N, N] mask — the fused rect kernel loads these and
    forms the penalty with an in-register compare (the materialized
    mask block was the VMEM term that Mosaic-rejected the shifted
    kernel at 256^2, fused_rect_diag2 2026-08-20)."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -hsp), slice(-hsp, -sh if sh else None), slice(-sh, None) if sh else slice(0, 0)):
        for wsl in (slice(0, -wsp), slice(-wsp, -sw if sw else None), slice(-sw, None) if sw else slice(0, 0)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(h // hsp, hsp, w // wsp, wsp).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(m.reshape(-1, hsp * wsp))


def rect_shift_attn_mask(
    h: int, w: int, hsp: int, wsp: int, sh: int, sw: int
) -> np.ndarray:
    """Shifted-window mask for rectangular hsp x wsp windows with shifts
    (sh, sw) on (H, W) (DAT's calculate_mask, dat_arch.py:318-361).
    Returns [nW, hsp*wsp, hsp*wsp] float32 with 0 / -100."""
    m = rect_shift_region_ids(h, w, hsp, wsp, sh, sw)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def relative_position_index(ws_h: int, ws_w: int | None = None) -> np.ndarray:
    """Swin relative-position index table, [ws_h*ws_w, ws_h*ws_w] int32.

    Matches the buffer the reference builds at init
    (network_swinir.py:89-103, hat_arch.py:882-894): flattened pairwise
    (dh, dw) offsets remapped to a single index into the
    [(2*ws_h-1)*(2*ws_w-1)] bias table.
    """
    if ws_w is None:
        ws_w = ws_h
    coords = np.stack(
        np.meshgrid(np.arange(ws_h), np.arange(ws_w), indexing="ij")
    )  # [2, h, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws_h - 1
    rel[:, :, 1] += ws_w - 1
    rel[:, :, 0] *= 2 * ws_w - 1
    return rel.sum(-1).astype(np.int32)


def relative_position_index_oca(ws: int, ows: int) -> np.ndarray:
    """Relative-position index for overlapping cross-attention: q tokens
    from a ws x ws window, k/v tokens from the enclosing ows x ows window.

    Exactly reproduces the reference's calculate_rpi_oca
    (hat_arch.py:896-919) INCLUDING its quirk: the "+ ws - ows + 1" shift
    leaves some entries negative, and torch's flat indexing into the
    [(ws+ows-1)^2] bias table then wraps them modulo the table size.  We
    bake the modulo in here so the table lookup is a plain gather.
    Returns [ws*ws, ows*ows] int32.
    """
    coords_q = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    coords_k = np.stack(
        np.meshgrid(np.arange(ows), np.arange(ows), indexing="ij")
    ).reshape(2, -1)
    # [2, ws*ws, ows*ows]: entry [., q, k] = k_coord - q_coord
    rel = coords_k[:, None, :] - coords_q[:, :, None]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - ows + 1
    rel[:, :, 1] += ws - ows + 1
    rel[:, :, 0] *= ws + ows - 1
    idx = rel.sum(-1)
    table_size = (ws + ows - 1) ** 2
    return np.mod(idx, table_size).astype(np.int32)

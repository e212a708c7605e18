"""Collapse the linear pixel-shuffle reconstruction tail into ONE conv.

The reference reconstruction path after `conv_before_upsample`'s
LeakyReLU is purely linear — `Upsample` is conv3x3 -> PixelShuffle
repeated with NO nonlinearity between stages, followed by `conv_last`
(network_swinir.py:572-591,816-817; hat_arch.py:688-707; dat_arch.py:
655-696).  Run naively, that chain materializes feature maps at 2x and
4x resolution (e.g. a [1024,1024,64] bf16 map = 134 MB for a 256x256
input at x4) and burns ~103 GFLOP of layout-hostile convs; measured on
v5e it is 9.5 ms of the 48 ms SwinIR-M forward against a ~0.6 ms
roofline.

Because composition of convolutions and pixel-shuffles is itself a
strided convolution, the whole tail is algebraically equal to a single
low-resolution conv producing `out_ch * scale**2` channels followed by
ONE pixel_shuffle(scale).  This module composes the effective kernel
and bias at trace time from the SAME parameter arrays the step-by-step
chain uses (so checkpoints are interchangeable) and applies it as one
MXU-dense GEMM-shaped conv: ~10 GFLOP and ~25 MB of HBM traffic for the
case above.

Border semantics: the chain zero-pads each intermediate map at its own
resolution, i.e. it truncates the (nonzero) virtual values a border-
crossing tap would see; the composed conv zero-pads only the low-res
input.  The two therefore agree EXACTLY on the interior but differ on a
ring of at most `ceil(reach)*scale` output pixels at the image border
(reach = sum of per-stage kernel radii in input pixels, 1.75 for x4).
Tiled inference feather-blends tile borders away; parity tests pin the
exact chain via `fused_reconstruct=False`.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _rep_onehot(r: int) -> np.ndarray:
    """One-hot tensor M expressing a 3x3 conv at r-times resolution as a
    3x3 conv on the low-res lattice over pixel-shuffle-expanded channels.

    Channel convention (torch PixelShuffle, C-major): rep index
    c*r*r + I*r + J holds true channel c at subpixel (I, J).

    M[A, B, s_in, s_out, dy, dx] = 1  iff the high-res tap (dy, dx) of
    output subpixel (i, j) = divmod(s_out, r) reads input subpixel
    s_in = (ii, jj) at low-res offset (A-1, B-1).
    """
    M = np.zeros((3, 3, r * r, r * r, 3, 3), np.float32)
    for i in range(r):
        for j in range(r):
            for dy in range(3):
                for dx in range(3):
                    iy, ix = i + dy - 1, j + dx - 1
                    a, ii = iy // r, iy % r
                    b, jj = ix // r, ix % r
                    M[a + 1, b + 1, ii * r + jj, i * r + j, dy, dx] = 1.0
    return M


def _rep_kernel(w, r: int, xp):
    """[3,3,cin,cout] conv at r-times resolution -> low-lattice conv
    [3,3,cin*r^2,cout*r^2] over rep channels."""
    if r == 1:
        return w
    cin, cout = w.shape[2], w.shape[3]
    M = _rep_onehot(r)
    k = xp.einsum("ABstyx,yxcd->ABcsdt", M, w)
    return k.reshape(3, 3, cin * r * r, cout * r * r)


def _compose_offsets(k_old, k_rep, xp):
    """Spatially compose k_old [kh,kw,cin,cm] with a 3x3 k_rep
    [3,3,cm,cout] -> [kh+2,kw+2,cin,cout] (offset centers add)."""
    kh, kw, cin, _ = k_old.shape
    cout = k_rep.shape[3]
    out = np.zeros((kh + 2, kw + 2, cin, cout), np.float32) if xp is np else (
        jnp.zeros((kh + 2, kw + 2, cin, cout), k_old.dtype)
    )
    for dy in range(3):
        for dx in range(3):
            contrib = xp.einsum("oucd,de->ouce", k_old, k_rep[dy, dx])
            if xp is np:
                out[dy : dy + kh, dx : dx + kw] += contrib
            else:
                out = out.at[dy : dy + kh, dx : dx + kw].add(contrib)
    return out


def _ps_perm(c_true: int, r: int, rho: int) -> np.ndarray:
    """Channel permutation applied by PixelShuffle(rho) on a map that is
    itself a rep at expansion r: returns src indices so that
    new[..., e] = old[..., perm[e]] with the rep convention at r*rho."""
    rp = r * rho
    perm = np.empty(c_true * rp * rp, np.int64)
    for c in range(c_true):
        for In in range(rp):
            for Jn in range(rp):
                I, i = In // rho, In % rho
                J, j = Jn // rho, Jn % rho
                src = (c * rho * rho + i * rho + j) * r * r + I * r + J
                perm[c * rp * rp + In * rp + Jn] = src
    return perm


def _compose(stages, last, xp):
    """Compose [(kernel, bias, rho)...] + final (kernel, bias) into
    (K [kh,kw,cin,out*r^2], B [out*r^2], r).  Kernel index o corresponds
    to low-res offset o - (n_stages), since each composed 3x3 shifts the
    center by one."""
    k0, b0, rho0 = stages[0]
    K, B, r = k0, b0, 1
    c_true = k0.shape[3] // (rho0 * rho0)
    perm = _ps_perm(c_true, r, rho0)
    K, B = K[..., perm], B[perm]
    r *= rho0
    for w, b, rho in stages[1:]:
        k_rep = _rep_kernel(w, r, xp)
        K = _compose_offsets(K, k_rep, xp)
        b_rep = xp.repeat(b, r * r)
        B = b_rep + xp.einsum("yxce,c->e", k_rep, B)
        c_true = w.shape[3] // (rho * rho)
        perm = _ps_perm(c_true, r, rho)
        K, B = K[..., perm], B[perm]
        r *= rho
    wl, bl = last
    k_rep = _rep_kernel(wl, r, xp)
    K = _compose_offsets(K, k_rep, xp)
    B = xp.repeat(bl, r * r) + xp.einsum("yxce,c->e", k_rep, B)
    return K, B, r


@functools.lru_cache(maxsize=32)
def _support(shape_key) -> Tuple[int, int, int, int, int]:
    """Static nonzero-support bounding box of the composed kernel,
    computed once with random numpy weights of the same shapes (the zero
    pattern is structural, weight-independent for generic weights).
    Returns (y0, y1, x0, x1, ctr) into the untrimmed kernel."""
    stage_shapes, rhos, last_shape = shape_key
    rng = np.random.RandomState(0)
    stages = [
        (rng.rand(*s).astype(np.float32) + 0.5, rng.rand(s[3]).astype(np.float32), r)
        for s, r in zip(stage_shapes, rhos)
    ]
    last = (
        rng.rand(*last_shape).astype(np.float32) + 0.5,
        rng.rand(last_shape[3]).astype(np.float32),
    )
    K, _, _ = _compose(stages, last, np)
    nz = np.abs(K).max(axis=(2, 3)) > 0
    ys, xs = np.where(nz)
    # A composite of m 3x3 kernels spans 2m+1 taps with center index m
    # (m = len(stages) chain convs + conv_last).
    ctr = len(stages) + 1
    return int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max()), ctr


def composed_upsample_params(stages, last):
    """Compose the chain's parameter arrays into (W_eff, B_eff, padding, r).

    stages: sequence of (kernel [3,3,cin,cout], bias [cout], ps_factor)
    last:   (kernel [3,3,c,out_ch], bias [out_ch]) applied at full res.
    Returns W_eff trimmed to its structural support, the per-rep-channel
    bias, the asymmetric SAME padding, and the total scale r.
    """
    shape_key = (
        tuple(tuple(int(d) for d in w.shape) for w, _, _ in stages),
        tuple(int(r) for _, _, r in stages),
        tuple(int(d) for d in last[0].shape),
    )
    y0, y1, x0, x1, ctr = _support(shape_key)
    K, B, r = _compose(
        [(w.astype(jnp.float32), b.astype(jnp.float32), rho) for w, b, rho in stages],
        (last[0].astype(jnp.float32), last[1].astype(jnp.float32)),
        jnp,
    )
    K = K[y0 : y1 + 1, x0 : x1 + 1]
    pad = ((ctr - y0, (y1 - y0) - (ctr - y0)), (ctr - x0, (x1 - x0) - (ctr - x0)))
    return K, B, pad, r


# Impl switch for the composed conv ("xla" conv op | "halo" one-read
# Pallas kernel).  Flipped per conv_halo_flip_ab (2026-08-19, v5e):
# at the bench shape the halo upsampler conv contributes to the
# halo+all win (53.28 vs 55.20 ms xla); conv_halo self-gates back to
# the XLA op at VMEM-squeezed shapes.
CONV_IMPL = "halo"


def fused_pixelshuffle_reconstruct(y, stages, last, dtype=jnp.bfloat16):
    """Apply the composed reconstruction: one conv + one pixel_shuffle.

    y: [B, H, W, C] activations AFTER conv_before_upsample's LeakyReLU.
    Returns [B, H*r, W*r, out_ch].  Exact on the interior; differs from
    the step-by-step chain on a thin border ring (see module docstring).
    """
    from tpu_superresolution_tpu.ops.pixelshuffle import pixel_shuffle

    K, B, pad, r = composed_upsample_params(stages, last)
    if CONV_IMPL == "halo":
        from tpu_superresolution_tpu.ops.pallas.cab_conv import conv_halo

        v = conv_halo(y.astype(dtype), K, B, pad)
    else:
        v = jax.lax.conv_general_dilated(
            y.astype(dtype),
            K.astype(dtype),
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        v = v + B.astype(v.dtype)
    return pixel_shuffle(v, r)


def chain_pixelshuffle_reconstruct(y, stages, last, dtype=jnp.bfloat16):
    """Step-by-step oracle with the reference's exact semantics
    (conv3x3 zero-pad -> PixelShuffle per stage, then conv_last)."""
    from tpu_superresolution_tpu.ops.pixelshuffle import pixel_shuffle

    x = y.astype(dtype)
    for w, b, rho in stages:
        x = jax.lax.conv_general_dilated(
            x, w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(dtype)
        x = pixel_shuffle(x, rho)
    w, b = last
    return jax.lax.conv_general_dilated(
        x, w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(dtype)

"""3x3 same-padding convolution as nine shifted GEMMs.

Why this exists: XLA's conv op at HAT's CAB shapes (NHWC, B=1, C<=96,
interleaved between Pallas megakernel calls) measures ~1.35 ms per
3x3 conv IN-MODEL — roughly 30x its standalone cost (PARITY.md,
"HAT forward attribution").  Re-expressing the conv as nine shifted
[B*H*W, Cin] x [Cin, Cout] GEMMs keeps the FLOPs on the MXU as plain
dot_generals that XLA pipelines cleanly with the surrounding Pallas
calls: whole-model HAT forward 93.0 -> 87.0 ms (measured on v5e,
256x256 x4 bf16, interleaved A/B vs the conv op and an NCHW variant
which came in at 94.0).

Matches the reference CAB convs (/root/reference/modules/hat_arch.py:62-75)
bit-for-bit in fp32; in bf16 the fp32 accumulate is at least as
accurate as the conv op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_gemm"]


def conv3x3_gemm(x, kernel, bias=None):
    """SAME 3x3 conv, stride 1, computed as 9 shifted GEMMs.

    Args:
      x: [B, H, W, Cin] input (NHWC).
      kernel: [3, 3, Cin, Cout] — the flax ``nn.Conv`` kernel layout,
        so weights are interchangeable with the conv-op path.
      bias: optional [Cout].

    Accumulates in fp32 (``preferred_element_type``), adds the bias in
    fp32, and casts back to ``x.dtype``.
    """
    b, h, w, cin = x.shape
    k = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy:dy + h, dx:dx + w, :].reshape(-1, cin)
            t = jax.lax.dot_general(
                sl, k[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype).reshape(b, h, w, -1)

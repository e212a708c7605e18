"""Model export/serving: serialized StableHLO programs + parity check.

The TPU-native counterpart of the reference's ONNX deployment path
(model_debug.ipynb cells 12-16: torch.onnx.export + onnx.checker +
onnxruntime parity, max abs diff 2.68e-6).  Here the jitted forward is
exported as a **StableHLO** artifact via `jax.export` — loadable from
any JAX runtime (or XLA-compatible serving stack) without the Python
model definition — and `export_parity` replays the reference's
numerical check against the live model.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_model(
    model,
    variables,
    input_shape: Sequence[int],
    path: Optional[str] = None,
    dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the jitted forward (weights baked in) to StableHLO bytes.

    `platforms`: lowering targets, e.g. ("tpu",), ("cpu",), or both;
    defaults to the current backend.
    """

    def fwd(x):
        return model.apply(variables, x, train=False)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exp = jax_export.export(jax.jit(fwd), **kwargs)(
        jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    )
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported program; returns a callable f(x)."""
    blob = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    exp = jax_export.deserialize(bytearray(blob))
    return lambda x: exp.call(x)


def export_parity(
    model, variables, input_shape, dtype=jnp.float32, seed: int = 0
) -> Tuple[float, float]:
    """Round-trip export -> load -> compare vs the live model on random
    input (the reference's ONNX-parity pattern).  Returns (max_abs_diff,
    mean_abs_diff)."""
    blob = export_model(model, variables, input_shape, dtype=dtype)
    fn = load_exported(blob)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random(tuple(input_shape)), dtype)
    a = np.asarray(fn(x), np.float32)
    b = np.asarray(model.apply(variables, x, train=False), np.float32)
    d = np.abs(a - b)
    return float(d.max()), float(d.mean())

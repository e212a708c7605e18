"""Mixed-precision policy for TPU.

The reference validated two AMP regimes (fp16+GradScaler in
``modules/train.py:108,117-123,345`` and bf16-no-scaler in
``modules/finetune_swinir.py:161,311``).  On TPU the idiomatic policy is
simpler: **fp32 parameters / optimizer state, bf16 activations+compute,
fp32 losses/metrics/reductions** — no loss scaling needed since bf16 has
fp32's exponent range.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through models and the train engine."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32  # model outputs cast back for loss/metrics

    def cast_to_compute(self, x):
        import jax

        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )

    def cast_to_output(self, x):
        import jax

        return jax.tree.map(
            lambda a: a.astype(self.output_dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)

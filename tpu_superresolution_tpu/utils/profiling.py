"""Profiling utilities — the TPU upgrade of the reference's wall-clock
timers (train.py:98-135 data/step split, warmup_profile :79-86,
eval throughput evaluate.py:149,229-233).

- `trace_context`: jax.profiler trace (XPlane) around a code region,
  viewable in TensorBoard/XProf.
- `StepTimer`: host-side data-time vs step-time accounting with the same
  split the reference reports per epoch.
- `device_memory_stats`: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
    """Profile the enclosed region with jax.profiler (no-op if logdir is
    None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Accumulates data-load vs device-step time per epoch."""

    data_t: float = 0.0
    step_t: float = 0.0
    n: int = 0
    _mark: float = field(default_factory=time.perf_counter)

    def batch_loaded(self):
        now = time.perf_counter()
        self.data_t += now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_t += now - self._mark
        self._mark = now
        self.n += 1

    @property
    def mean_data_t(self) -> float:
        return self.data_t / max(1, self.n)

    @property
    def mean_step_t(self) -> float:
        return self.step_t / max(1, self.n)

    def reset(self):
        self.data_t = self.step_t = 0.0
        self.n = 0
        self._mark = time.perf_counter()


def device_memory_stats() -> List[Dict]:
    """Per-device HBM usage (bytes), when the backend exposes it."""
    import jax

    out = []
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        out.append(
            {
                "device": str(d),
                "bytes_in_use": (stats or {}).get("bytes_in_use"),
                "bytes_limit": (stats or {}).get("bytes_limit"),
            }
        )
    return out

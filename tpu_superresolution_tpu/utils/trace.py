"""Chrome-trace (Trace Event Format) recorder — the tunnel-safe
tracing artifact.

The reference logs wall-clock phases ad hoc (train.py:98-135,
evaluate.py:229-233).  The XPlane path (`utils.profiling.trace_context`)
is the full-fidelity TPU profile, but `jax.profiler.start_trace` HANGS
over the axon tunnel (measured — CLAUDE.md), so this recorder provides
a host-side timeline that always works: named spans and counters
written as Trace Event Format JSON, loadable in Perfetto / chrome://
tracing.  The train engine emits per-epoch train/val spans and
loss/PSNR counter tracks when `Trainer(trace_path=...)` is set
(`--trace` on the train/finetune CLIs).

Format: https://docs.google.com/document/d/1CvAClvFfyA5R-PhYUmn5OOQtYMH4h6I0nSsKchNAySU
(the de-facto public spec); only "X" (complete span), "C" (counter)
and "i" (instant) events are emitted — every viewer supports them.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

__all__ = ["TraceRecorder"]


@dataclass
class TraceRecorder:
    """Collects host-side spans/counters; `save()` writes chrome-trace
    JSON.  All timestamps are microseconds relative to construction so
    traces from different runs align at t=0."""

    events: List[Dict[str, Any]] = field(default_factory=list)
    _t0: float = field(default_factory=time.perf_counter)

    def _now_us(self) -> float:
        return (time.perf_counter() - self._t0) * 1e6

    @contextlib.contextmanager
    def span(self, name: str, track: str = "main", **args):
        """Context manager emitting one complete ("X") event."""
        ts = self._now_us()
        try:
            yield
        finally:
            self.events.append(
                {
                    "name": name,
                    "ph": "X",
                    "ts": ts,
                    "dur": self._now_us() - ts,
                    "pid": 0,
                    "tid": track,
                    "args": {k: v for k, v in args.items() if v is not None},
                }
            )

    def complete(self, name: str, start_s: float, dur_s: float,
                 track: str = "main", **args):
        """Record an already-measured span (seconds relative to the
        recorder's epoch) — for callers that keep their own timers."""
        self.events.append(
            {
                "name": name,
                "ph": "X",
                "ts": start_s * 1e6,
                "dur": dur_s * 1e6,
                "pid": 0,
                "tid": track,
                "args": {k: v for k, v in args.items() if v is not None},
            }
        )

    def counter(self, name: str, value: float, ts_us: Optional[float] = None):
        self.events.append(
            {
                "name": name,
                "ph": "C",
                "ts": self._now_us() if ts_us is None else ts_us,
                "pid": 0,
                "args": {name: value},
            }
        )

    def instant(self, name: str, track: str = "main", **args):
        self.events.append(
            {
                "name": name,
                "ph": "i",
                "ts": self._now_us(),
                "pid": 0,
                "tid": track,
                "s": "t",
                "args": args,
            }
        )

    @property
    def elapsed_s(self) -> float:
        return time.perf_counter() - self._t0

    def save(self, path: str):
        """Write Trace Event Format JSON (object form, so metadata can
        ride along)."""
        # map string track names onto stable integer tids + name them
        tids: Dict[str, int] = {}
        out = []
        meta = []
        for e in self.events:
            e = dict(e)
            tid = e.get("tid", "main")
            if isinstance(tid, str):
                if tid not in tids:
                    tids[tid] = len(tids)
                    meta.append(
                        {
                            "name": "thread_name",
                            "ph": "M",
                            "pid": 0,
                            "tid": tids[tid],
                            "args": {"name": tid},
                        }
                    )
                e["tid"] = tids[tid]
            out.append(e)
        with open(path, "w") as f:
            json.dump({"traceEvents": meta + out, "displayTimeUnit": "ms"}, f)

"""On-device interleaved A/B timing harness.

The round-2 kernel wins were all driven by an ad-hoc methodology this
module makes reusable (SURVEY §5's profiling subsystem, given that
``jax.profiler`` hangs over the axon tunnel):

- **on-device repetition**: each candidate runs inside a
  ``lax.fori_loop`` so one dispatch covers `inner` iterations — host
  dispatch and tunnel latency (which made sub-millisecond timings
  unphysical) amortize away;
- **interleaved rounds**: candidates run A,B,C,A,B,C,... within ONE
  process, `rounds` times.  Run-order inside a process was measured to
  shift kernel timings by up to ~40% (PARITY.md), so never A/B two
  variants <10% apart from separate runs or back-to-back blocks;
- per-candidate min/median over rounds (min is the contention-free
  estimate; median guards against a lucky outlier).

Usage::

    from tpu_superresolution_tpu.utils.ablate import ablate

    results = ablate(
        {"jnp": lambda: jnp_path(x), "kernel": lambda: kernel_path(x)},
        inner=50, rounds=5,
    )
    # results["kernel"].min_s, .median_s, .times_s

Each thunk must return a jax array (or pytree) computed from values it
closes over; the harness wraps it as ``lax.fori_loop`` body with a
dependency chain so XLA cannot hoist the work out of the loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Mapping

import jax
import jax.numpy as jnp


@dataclass
class AblateResult:
    times_s: List[float] = field(default_factory=list)

    @property
    def min_s(self) -> float:
        return min(self.times_s)

    @property
    def median_s(self) -> float:
        s = sorted(self.times_s)
        return s[len(s) // 2]

    @property
    def spread(self) -> float:
        """(max-min)/min over rounds — >0.1 means rerun with more
        rounds before trusting a close comparison."""
        return (max(self.times_s) - min(self.times_s)) / max(self.min_s, 1e-12)


def _looped(thunk: Callable[..., jax.Array], inner: int):
    """Jit a fori_loop running `thunk` `inner` times with a carried
    dependency so the work cannot be hoisted or elided.

    IMPORTANT: an argless thunk's output only feeds the carry — XLA can
    still hoist the (loop-invariant) computation itself out of the loop
    for pure-HLO candidates, leaving the loop measuring dispatch latency
    (measured: conv/gelu candidates at 259^2 all timed identically at
    ~0.9 ms = the ~27 ms tunnel round trip / inner).  Pallas calls
    appear opaque to LICM, which is why kernel A/Bs still worked.  A
    thunk that accepts one argument receives the fp32 carry scalar and
    MUST mix it into its inputs, e.g.::

        lambda s: f(x + (s * 1e-30).astype(x.dtype))

    which makes every iteration's input a fresh runtime value (the
    broadcast add costs one elementwise pass — negligible at ms
    scale)."""
    import inspect

    try:
        takes_arg = len(inspect.signature(thunk).parameters) >= 1
    except (TypeError, ValueError):
        takes_arg = False

    def run(seed):
        def body(_, carry):
            out = thunk(carry) if takes_arg else thunk()
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, inner, body, seed)

    return jax.jit(run)


def ablate(
    candidates: Mapping[str, Callable[[], jax.Array]],
    inner: int = 50,
    rounds: int = 5,
    warmup: int = 1,
    verbose: bool = False,
) -> Dict[str, AblateResult]:
    """Time each candidate thunk on device, interleaved.

    Returns {name: AblateResult}; ``times_s`` entries are per-ITERATION
    seconds (loop time / inner).  All candidates compile first, then a
    warmup pass runs, then `rounds` interleaved timed passes.
    """
    compiled = {}
    for name, thunk in candidates.items():
        fn = _looped(thunk, inner)
        seed = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(seed))  # compile + first run
        if verbose or time.perf_counter() - t0 > 5:
            print(f"[ablate] compiled {name}: {time.perf_counter() - t0:.0f}s",
                  flush=True)
        compiled[name] = fn

    for _ in range(warmup):
        for fn in compiled.values():
            jax.block_until_ready(fn(jnp.zeros((), jnp.float32)))

    results = {name: AblateResult() for name in candidates}
    for r in range(rounds):
        for name, fn in compiled.items():
            seed = jnp.float32(r)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(seed))
            dt = (time.perf_counter() - t0) / inner
            results[name].times_s.append(dt)
            if verbose:
                print(f"[ablate] round {r} {name}: {dt * 1e3:.3f} ms", flush=True)
    return results


def report(results: Dict[str, AblateResult]) -> str:
    """Human-readable table, fastest first, with x-vs-best ratios."""
    rows = sorted(results.items(), key=lambda kv: kv[1].min_s)
    best = rows[0][1].min_s
    lines = [f"{'name':24s} {'min ms':>10s} {'median ms':>10s} {'vs best':>8s} {'spread':>7s}"]
    for name, r in rows:
        lines.append(
            f"{name:24s} {r.min_s * 1e3:10.3f} {r.median_s * 1e3:10.3f} "
            f"{r.min_s / best:8.2f} {r.spread:7.1%}"
        )
    return "\n".join(lines)

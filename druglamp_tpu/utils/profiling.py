"""Profiling / tracing hooks.

The reference has no profiling beyond wall-clock prints (SURVEY §5.1).  Here
tracing is first-class: ``trace()`` wraps a region in a jax.profiler trace
(viewable in XProf/TensorBoard), and ``StepTimer`` tracks per-step latency
with jitted-step-aware synchronization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self, sync_tree=None):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        assert self._t0 is not None
        self._times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps": n,
            "mean_ms": 1000 * sum(ts) / n,
            "p50_ms": 1000 * ts[n // 2],
            "p90_ms": 1000 * ts[min(n - 1, int(0.9 * n))],
            "max_ms": 1000 * ts[-1],
        }


def device_time_ms(fn, *args, n1: int = 10, n2: int = 40) -> float:
    """Per-call device execution time via TWO-POINT measurement.

    On the tunneled TPU runtime neither synchronization primitive yields an
    unbiased microbenchmark by itself: ``jax.block_until_ready`` can return
    before remote execution completes (timing only enqueue), while a real
    D2H fetch adds a ~100-150 ms roundtrip that swamps sub-ms kernels when
    amortized over few iterations.  Timing n1 and n2 enqueue-then-fetch
    batches and differencing cancels every fixed cost (dispatch setup, the
    fetch roundtrip) exactly:

        t(n2) - t(n1) = (n2 - n1) * t_exec

    The fetch (``np.asarray`` of a freshly computed scalar sum) also forces
    completion and surfaces deferred execution errors."""
    import numpy as np

    import jax.numpy as jnp

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
        return time.perf_counter() - t0

    fn(*args)
    run(1)                       # warm: compile + first fetch
    ta, tb = run(n1), run(n2)
    return (tb - ta) / (n2 - n1) * 1e3

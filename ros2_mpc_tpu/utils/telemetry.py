"""Solver/control-loop telemetry.

The reference's observability is ad-hoc wall-clock logger lines
(e.g. scripts/path_follower_local_planner.py:154-156) and an RViz window
(SURVEY.md §5). Here every control loop records structured per-tick metrics
— solve latency, KKT residual, cost, convergence — with p50/p99 summaries
(the BASELINE latency metric), plus optional ``jax.profiler`` trace capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class Telemetry:
    def __init__(self, name: str, capacity: int = 100_000):
        self.name = name
        self.capacity = capacity
        self.series: dict[str, list] = defaultdict(list)

    def record(self, **metrics):
        for k, v in metrics.items():
            s = self.series[k]
            if len(s) < self.capacity:
                s.append(v)

    @contextlib.contextmanager
    def timer(self, key: str):
        t0 = time.perf_counter()
        yield
        self.record(**{key: time.perf_counter() - t0})

    def percentiles(self, key: str, qs=(50, 99)) -> dict:
        vals = np.asarray(self.series.get(key, []), dtype=float)
        if vals.size == 0:
            return {f"p{q}": float("nan") for q in qs}
        return {f"p{q}": float(np.percentile(vals, q)) for q in qs}

    def summary(self) -> dict:
        out = {"name": self.name, "n_ticks": len(next(iter(self.series.values()), []))}
        for key, vals in self.series.items():
            arr = np.asarray(vals, dtype=float)
            if arr.size:
                out[key] = {
                    "mean": float(arr.mean()),
                    "p50": float(np.percentile(arr, 50)),
                    "p99": float(np.percentile(arr, 99)),
                    "max": float(arr.max()),
                }
        return out


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

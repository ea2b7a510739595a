"""Observability: stage timers + device-trace hooks.

The reference's tracing is a single wall-clock print around the SPA solve
(/root/reference/yag_slam/graph_slam.py:264-267); here timers are
first-class (per-stage accumulators on GraphSlam.stats plus this module's
explicit tools) and `device_trace` wraps `jax.profiler` for XLA-level
timelines.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating named timers: `with timer("match"): ...`"""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self):
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(
                    1000.0 * self.totals[name] / max(self.counts[name], 1), 3
                ),
            }
            for name in sorted(self.totals)
        }

    def report(self):
        for name, row in self.summary().items():
            print(
                f"[timer] {name}: {row['count']}x, mean {row['mean_ms']} ms, "
                f"total {row['total_s']} s"
            )


@contextlib.contextmanager
def device_trace(log_dir="/tmp/yag_slam_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, repeats=10, **kwargs):
    """Time a jitted callable with proper device synchronization; returns
    (mean_seconds, last_result)."""
    import jax

    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(repeats):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    return (time.perf_counter() - t0) / repeats, result

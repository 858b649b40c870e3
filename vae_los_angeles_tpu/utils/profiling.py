"""Timing + profiling helpers (SURVEY §5 tracing row: the reference only has
ad-hoc ``time.time()``; here samples/sec is first-class since it is a
BASELINE.json metric)."""

from __future__ import annotations

import contextlib
import json
import time

import jax


class StepTimer:
    """Wall-clock timer that blocks on device work for honest numbers."""

    def __init__(self):
        self.t0 = None
        self.elapsed = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def block_until_ready(tree):
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        tree,
    )
    return tree


@contextlib.contextmanager
def device_timer():
    """Times a block including completion of all dispatched device work."""
    timer = StepTimer()
    with timer:
        yield timer


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def bench_line(metric: str, value: float, unit: str, vs_baseline: float) -> str:
    return json.dumps(
        {
            "metric": metric,
            "value": round(float(value), 4),
            "unit": unit,
            "vs_baseline": round(float(vs_baseline), 4),
        }
    )

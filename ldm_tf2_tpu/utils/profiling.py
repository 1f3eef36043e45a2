"""Profiling: jax.profiler traces (XProf/Perfetto) + block_until_ready timing.

The reference has no tracing at all (SURVEY.md §5: the `logdir` kwarg in its
trainers is dead code).  `trace(logdir)` captures a device trace viewable in
XProf/Perfetto; `Timer` is the measurement harness behind bench.py.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that synchronizes on device completion."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0

    @staticmethod
    def time_fn(fn, *args, iters: int = 3, warmup: int = 1):
        """Median wall time of fn(*args) with block_until_ready."""
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

"""Profiling / timing harness (SURVEY.md §5.1 rebuild note: the reference
only has manual time.time() deltas; here: block_until_ready timing and
jax.profiler trace capture for xprof/tensorboard)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 10,
            **kwargs) -> dict:
    """Median/mean wall time of fn(*args) with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "mean_s": sum(times) / len(times),
        "min_s": times[0],
        "iters": iters,
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()

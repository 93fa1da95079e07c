"""Profiling helpers: jax.profiler traces + wall-clock timing.

The reference has no profiling at all (SURVEY.md §5). These wrap
``jax.profiler`` so any driver can emit a TensorBoard-viewable trace with
``--trace-dir`` and report steady-state step times.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "time_fn"]


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Profile the enclosed block to ``trace_dir`` (no-op when None)."""
    if trace_dir is None:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> dict:
    """Compile/warm up then time ``fn(*args)`` with block_until_ready.

    Returns {'best_s', 'mean_s', 'times'}.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {"best_s": min(times), "mean_s": sum(times) / len(times), "times": times}

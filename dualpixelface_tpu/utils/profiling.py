"""Profiling / tracing harness.

TPU-native equivalent of the reference's always-on PL profiler
(ref main.py:57 `profiler="pytorch"`, SURVEY.md §5): a `jax.profiler.trace`
context writing TensorBoard-compatible traces into the workspace log dir,
plus a block_until_ready timing helper for micro-benchmarks.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Wrap a region in a jax profiler trace (no-op if logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(str(logdir)):
        yield


def timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Mean seconds per call with device synchronization."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

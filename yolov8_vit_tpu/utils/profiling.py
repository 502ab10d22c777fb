"""Tracing/profiling — a first-class module (the reference has only
wall-clock epoch prints, SURVEY.md §5 "Tracing/profiling: none").

  * `trace(path)`: context manager around `jax.profiler` emitting a
    TensorBoard-loadable trace of device execution.
  * `StepTimer`: per-stage step timing with p50/p95 summaries.
  * `device_barrier(tree)`: reliable completion barrier — materializes a
    4-byte scalar reduction, because `block_until_ready` is a no-op on
    tunneled device transports (measured in bench.py).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_barrier_fn = None


def device_barrier(tree) -> float:
    """Block until every array in `tree` has finished computing."""
    global _barrier_fn
    if _barrier_fn is None:
        _barrier_fn = jax.jit(lambda t: jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x).astype(jnp.float32), t)))
    return float(_barrier_fn(tree))


class StepTimer:
    """Accumulate per-stage wall times; report percentiles."""

    def __init__(self):
        self._times: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, barrier_tree=None):
        t0 = time.perf_counter()
        yield
        if barrier_tree is not None:
            device_barrier(barrier_tree)
        self._times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._times[name].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, ts in self._times.items():
            arr = np.asarray(ts)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
            }
        return out

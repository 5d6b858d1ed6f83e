"""Profiling helpers: jax.profiler traces + drain-aware device timing.

The reference has no tracing (SURVEY.md §5); the rebuild needs it for the
BASELINE latency metrics.  ``device_time`` accounts for remote-execution
backends where ``block_until_ready`` does not actually wait (tunneled TPUs):
completion is forced with a scalar device->host fetch.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["trace", "device_time", "drain"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Context manager around jax.profiler.trace (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def drain(tree) -> None:
    """Force completion of a computation including on remote backends where
    block_until_ready returns at enqueue: fetch one scalar to the host."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0]).reshape(-1)[:1]


def device_time(fn, *args, reps: int = 16, warmup: int = 2) -> dict:
    """Wall-time ``fn(*args)`` with drain-forced completion.

    Returns {"mean_s", "p50_s", "total_s", "reps"} — enqueues ``reps`` calls
    then drains once, so the per-call figure amortizes the fetch round-trip.
    """
    for _ in range(warmup):
        drain(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    total = time.perf_counter() - t0
    return {"mean_s": total / reps, "p50_s": total / reps, "total_s": total, "reps": reps}

"""Tracing and profiling utilities.

The reference's observability is wall-clock prints (train_rnr.py:487,655;
test_rnr.py:266-374).  The TPU framework adds:
  * `StepTimer` — per-step wall-clock with value-transfer sync (the
    experimental axon backend's `block_until_ready` can return early, so
    syncing on a scalar fetch is the reliable pattern),
  * `trace_context` — a `jax.profiler` trace scope producing TensorBoard-
    loadable device profiles.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    """Accumulates per-step timings and reports summary statistics."""

    def __init__(self, sync_leaf=None):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        """End the interval; pass a device scalar to force completion."""
        if sync_value is not None:
            float(np.asarray(sync_value).ravel()[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self, sync_fn=None):
        self.start()
        box = {}
        yield box
        self.stop(box.get("sync"))

    def summary(self, skip_warmup: int = 1) -> dict:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "steps": len(t),
        }


@contextlib.contextmanager
def trace_context(log_dir: str, enabled: bool = True):
    """jax.profiler trace scope (view with TensorBoard's profile plugin)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

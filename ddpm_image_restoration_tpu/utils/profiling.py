"""Profiling / tracing — a new aux subsystem (the reference has none: its only
observability is tqdm bars, SURVEY.md §5).

  * `trace(logdir)`       — context manager around jax.profiler for XLA/TPU
                            timeline captures viewable in TensorBoard/Perfetto.
  * `StepTimer`           — wall-clock per-step timing that forces a device
                            sync (the tunneled TPU platform's
                            block_until_ready is unreliable, so sync is via a
                            tiny device->host transfer).
  * `annotate(name)`      — TraceAnnotation for named regions inside steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def sync(x=None):
    """Force completion of all pending work feeding `x` (or a trivial op)."""
    if x is None:
        x = jax.numpy.zeros(())
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "shape")]
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])


class StepTimer:
    """Accumulates per-step wall times; `summary()` gives mean/p50/p90."""

    def __init__(self, sync_every: int = 1):
        self.times: List[float] = []
        self.sync_every = sync_every
        self._t0: Optional[float] = None
        self._count = 0

    @contextlib.contextmanager
    def step(self, result=None):
        t0 = time.perf_counter()
        yield
        self._count += 1
        if self._count % self.sync_every == 0:
            sync(result)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(self.times),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
        }

"""Per-block timing and JAX profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md section 5); the
north-star metric here is samples/s/chip, so the streaming path carries:

- ``BlockTimer``: cheap wall-clock accumulator with percentile summaries —
  wraps each device dispatch in the stream sessions.
- ``trace_context``: context manager around jax.profiler.trace for
  capturing TensorBoard-compatible device traces of the hot loop
  (TOTTON_TRACE_DIR=/path enables it in the CLIs).
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


class BlockTimer:
    """Accumulates per-dispatch wall-clock timings."""

    def __init__(self, capacity: int = 4096) -> None:
        self._times = np.zeros(capacity, dtype=np.float64)
        self._n = 0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.monotonic()
        yield
        dt = time.monotonic() - t0
        if self._n < len(self._times):
            self._times[self._n] = dt
        else:  # ring: overwrite oldest
            self._times[self._n % len(self._times)] = dt
        self._n += 1

    @property
    def count(self) -> int:
        return self._n

    def summary(self) -> dict:
        n = min(self._n, len(self._times))
        if n == 0:
            return {"count": 0}
        t = self._times[:n] * 1e3
        return {
            "count": self._n,
            "mean_ms": float(np.mean(t)),
            "p50_ms": float(np.percentile(t, 50)),
            "p95_ms": float(np.percentile(t, 95)),
            "p99_ms": float(np.percentile(t, 99)),
            "max_ms": float(np.max(t)),
        }


@contextlib.contextmanager
def trace_context(trace_dir: str | None = None):
    """jax.profiler.trace wrapper; no-op when no directory is configured.

    Enable via argument or the TOTTON_TRACE_DIR environment variable; view
    the result with TensorBoard's profile plugin or xprof.
    """
    trace_dir = trace_dir or os.environ.get("TOTTON_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield

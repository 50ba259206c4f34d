"""Profiling / tracing utilities.

The reference's only observability is TensorBoard scalar summaries
(SURVEY.md §5); the TPU framework exposes real tracing: a context manager
around ``jax.profiler`` producing a TensorBoard-loadable trace, plus a
lightweight step timer for throughput lines in the training log.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (XLA ops, TPU timelines) into
    ``log_dir/plugins/profile``; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + clouds/sec; negligible overhead (host clock only)."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._times: list[float] = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    @property
    def clouds_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

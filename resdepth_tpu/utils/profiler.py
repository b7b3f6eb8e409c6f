"""Profiling hooks.

The reference's only timing is coarse wall-clock over the whole run
(SURVEY.md §5 — lib/Trainer.py:257,308-310). The TPU build exposes
first-class tracing: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, step annotations, and a lightweight step timer.
Enabled via ``cfg.tpu.profile_dir``.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Trace the enclosed block with jax.profiler when a directory is set."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str, step: int):
    import jax

    with jax.profiler.StepTraceAnnotation(name, step_num=step):
        yield


class StepTimer:
    """Rolling per-step wall-clock statistics (host view of device steps)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._samples: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._samples.append(now - self._last)
            if len(self._samples) > self.window:
                self._samples.pop(0)
        self._last = now

    @property
    def mean_ms(self) -> float:
        if not self._samples:
            return 0.0
        return 1e3 * sum(self._samples) / len(self._samples)

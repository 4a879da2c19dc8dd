"""Profiling / tracing helpers.

The reference had only AverageMeter prints (SURVEY.md §5.1); the
rebuild exposes the JAX profiler so a user can capture device traces
(XProf/TensorBoard-viewable) and see the MXU/HBM picture per step —
required to prove the throughput target.

Usage: ``python -m tpuasr.cli.train ... --profile-dir /tmp/trace``
traces steps 10-15 of the first epoch, or programmatically:

    with step_trace("/tmp/trace", enabled=True):
        state, metrics = train_step(...)
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def step_trace(log_dir: str | None, enabled: bool = True):
    if not (log_dir and enabled):
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepProfiler:
    """Trace a window of training steps [start, stop) into log_dir."""

    def __init__(self, log_dir: str | None, start: int = 10, stop: int = 15):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.log_dir and not self._active and step == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

"""Tracing and timing utilities.

The reference has no built-in profiling (SURVEY.md §5 — timing via the
external torchlight Timer in examples). Here: a device-synchronizing
Timer, a per-iteration solver timing callback, and a jax.profiler trace
context for TensorBoard-compatible TPU traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timer:
    """Wall-clock timer that synchronizes the device at boundaries."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.laps = []

    def lap(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        self.laps.append(dt)
        return dt

    @property
    def total(self) -> float:
        return sum(self.laps)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view in TensorBoard / xprof).

    NOTE: may hang on relayed/experimental backends (e.g. the axon
    tunnel used on this rig) — intended for directly-attached TPUs.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class IterationTimer:
    """Per-iteration timing via the solver's ``callback=`` hook.

    Forces an eager (non-scanned) solve, so use for diagnosis only:
        timer = IterationTimer()
        solver.solve(..., callback=timer)
        print(timer.times)
    """

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def __call__(self, iter, state, rho, lam):
        jax.block_until_ready(state[0])
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
        self._t0 = now

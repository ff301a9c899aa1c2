"""Profiling & metering utilities (SURVEY.md §5: absent in the reference —
its only meter was the renderer FPS counter, gWindow.cpp:176-178).

* `Timer` / `time_fn` — block-until-ready wall-clock timing of jitted fns.
* `StepsMeter` — running env-steps/s meter for training loops.
* `trace` — context manager around `jax.profiler` for TensorBoard traces.
* `debug_nans` — scoped NaN debugging (replaces the reference's vestigial
  `reward == np.nan` check, helicopter.py:203).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kw):
    """Median-free simple timing: run `warmup` untimed calls (compile), then
    `iters` timed calls with device sync. Returns seconds per call."""
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class StepsMeter:
    """Running throughput meter: feed it env-step counts, read steps/s."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, n: int):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped `jax_debug_nans`: raises at the op that produced a NaN."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

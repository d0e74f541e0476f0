"""Profiling / tracing hooks (SURVEY.md §5.1 equivalents).

The reference's tracing story was a vestigial chrome-trace merger (TimeLiner,
ScanNet/test_scannet_grid.py:53-75) plus manual EMA wall-clock timing. Here:

- `trace(logdir)`: context manager around jax.profiler for device traces
  viewable in Perfetto/TensorBoard;
- `StepTimer`: wall-clock EMA step timing with points/sec readout;
- `annotate(name)`: jax.profiler.TraceAnnotation wrapper so custom spans show
  in traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into logdir (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_trace(logdir: str) -> None:
    """Begin a device trace (non-contextmanager form for loop windows)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock EMA over train/eval steps (replaces the manual EMA timing in
    test_scannet_grid.py:126-160)."""

    def __init__(self, ema: float = 0.95, points_per_step: Optional[int] = None):
        self.ema = ema
        self.points_per_step = points_per_step
        self.avg = None
        self._t0 = None
        self.steps = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        self.steps += 1
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> str:
        if self.avg is None:
            return "no steps timed"
        msg = f"avg step {self.avg * 1e3:.2f} ms over {self.steps} steps"
        if self.points_per_step:
            msg += f" ({self.points_per_step / self.avg / 1e6:.2f} M points/sec)"
        return msg


class StepTraceWindow:
    """`--profile` support shared by every CLI driver: capture the first
    `steps` dispatches of a loop into `logdir`.

    Usage inside the loop body: `win.before()` ahead of the dispatch,
    `win.after(sync_obj)` past it; `win.close(sync_obj)` in a `finally`
    block so an interrupted window still ends the trace (jax.profiler
    crashes on process exit with an open trace). All methods are no-ops
    unless `enabled`, so call sites need no flag checks.
    """

    def __init__(self, logdir: str, enabled: bool, steps: int = 3, log=print):
        self.logdir = logdir
        self.enabled = enabled
        self.steps = steps
        self.log = log
        self._seen = 0
        self._tracing = False

    def before(self) -> None:
        if self.enabled and self._seen == 0 and not self._tracing:
            start_trace(self.logdir)
            self._tracing = True

    def after(self, sync_obj=None) -> None:
        if not self.enabled:
            return
        self._seen += 1
        if self._tracing and self._seen >= self.steps:
            self._finish(sync_obj)

    def close(self, sync_obj=None) -> None:
        if self._tracing:
            self._finish(sync_obj)

    def traced(self, thunk):
        """Run one dispatch inside the window: `before()`/thunk/`after()`,
        ending the trace if the dispatch itself raises. For call sites where
        a loop-level try/finally would be intrusive."""
        self.before()
        try:
            result = thunk()
        except BaseException:
            if self._tracing:
                stop_trace()
                self._tracing = False
            # Kill the window: a caller that catches the dispatch error and
            # keeps looping must not silently reopen a fresh trace into the
            # same logdir (_seen == 0 would re-arm before()).
            self._seen = self.steps
            raise
        self.after(result)
        return result

    def _finish(self, sync_obj) -> None:
        if sync_obj is not None:
            jax.block_until_ready(sync_obj)
        stop_trace()
        self._tracing = False
        self.log(f"profile trace written to {self.logdir}")

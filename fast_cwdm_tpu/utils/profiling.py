"""Profiling / tracing (SURVEY §5).

The reference's observability is hand-rolled wall-clock accumulators
(`[PROFILE]` lines, `train_util.py:302-309`) plus the logger's
``profile_kv`` (`logger.py:293-317`). The TPU-native equivalents here:

* :func:`trace` — `jax.profiler` traces viewable in TensorBoard/Perfetto,
  env-gated (``FAST_CWDM_TRACE_DIR``) so production runs pay nothing;
* :class:`StepTimer` — phase wall-clock accumulators emitting the same
  ``[PROFILE]`` line format;
* :func:`annotate` — named trace regions (`jax.profiler.TraceAnnotation`)
  around host-side phases.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(name: str = "trace", logdir: str | None = None):
    """Capture a jax.profiler trace if a log dir is configured."""
    logdir = logdir or os.environ.get("FAST_CWDM_TRACE_DIR")
    if not logdir:
        yield
        return
    with jax.profiler.trace(os.path.join(logdir, name)):
        yield


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Phase accumulators emitting the reference's ``[PROFILE]`` line
    (`train_util.py:302-309`)."""

    PHASES = ("data", "step", "log", "save")

    def __init__(self):
        self.reset()

    def reset(self):
        self.acc = {p: 0.0 for p in self.PHASES}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0

    def report(self, step: int) -> str:
        total = sum(self.acc.values())
        line = (
            f"[PROFILE] Step {step}: "
            f"Data={self.acc['data']:.2f}s Step={self.acc['step']:.2f}s "
            f"Log={self.acc['log']:.2f}s Save={self.acc['save']:.2f}s "
            f"Total={total:.2f}s"
        )
        self.reset()
        return line

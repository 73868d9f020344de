"""Profiling / tracing utilities (SURVEY.md §5 aux subsystem).

The reference has no profiling machinery (only HF Trainer's memory tracker);
TPU-native equivalents here:

* ``trace(logdir)``: context manager around ``jax.profiler`` — produces an
  xprof/tensorboard trace of device execution;
* ``annotate(name)``: TraceAnnotation wrapper so framework phases (encode /
  prefill / decode / train-step) show up as named spans in the trace;
* ``phase_timer``: lightweight host-side wall-clock phase accounting with
  ``block_until_ready`` fencing (correct timing under async dispatch);
* ``debug_nans(enable)``: toggles jax NaN-checking for numerics hunts.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture an xprof trace of everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in device traces: ``with annotate('prefill'): ...``"""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Host-side per-phase wall-clock accounting.

    >>> timer = PhaseTimer()
    >>> with timer.phase("vision_encode"):
    ...     feats = encode(...)          # fenced with block_until_ready
    >>> timer.summary()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._last_result = None

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self._last_result is not None:
                jax.block_until_ready(self._last_result)
                self._last_result = None
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def fence(self, value):
        """Mark a value to be block_until_ready'd when the phase closes."""
        self._last_result = value
        return value

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


def debug_nans(enable: bool = True) -> None:
    """Global NaN checking (jax re-runs offending ops de-optimized and
    raises at the first NaN producer)."""
    jax.config.update("jax_debug_nans", enable)

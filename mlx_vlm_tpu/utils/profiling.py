"""Tracing and phase profiling.

Role parity: SURVEY §5 aux subsystems (tracing/profiling) — the reference
reports tokens/sec and peak memory per generation and relies on external
Metal captures for kernel timing.  On TPU the native tool is
`jax.profiler`: this module wires XLA trace capture (viewable in
TensorBoard / Perfetto) and named phase annotations into the generate and
serving paths.

Usage:
- env `MLX_VLM_TPU_PROFILE_DIR=/tmp/trace` — every `trace_if_enabled()`
  region writes an XLA trace there.
- `annotate("prefill")` — context manager stamping a named region into the
  device trace (StepTraceAnnotation) AND recording host wall time.
- `PhaseTimer` — accumulates per-phase host durations; `.snapshot()` feeds
  /metrics and GenerationResult extras.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

__all__ = ["PhaseTimer", "annotate", "trace_if_enabled", "phase_timer",
           "global_phases"]


class PhaseTimer:
    """Thread-safe accumulator of named phase durations (seconds)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    def add(self, name: str, seconds: float):
        with self._lock:
            self._total[name] += seconds
            self._count[name] += 1

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                name: {"total_s": round(self._total[name], 6),
                       "count": self._count[name],
                       "mean_ms": round(
                           1e3 * self._total[name] / self._count[name], 3)}
                for name in self._total
            }

    def reset(self):
        with self._lock:
            self._total.clear()
            self._count.clear()


_GLOBAL = PhaseTimer()


def global_phases() -> PhaseTimer:
    """Process-wide phase timer (served at /metrics)."""
    return _GLOBAL


@contextlib.contextmanager
def annotate(name: str, timer: Optional[PhaseTimer] = None) -> Iterator[None]:
    """Named region: shows up in the XLA device trace AND accumulates host
    wall time in `timer` (default: the global timer)."""
    timer = timer or _GLOBAL
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        timer.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace_if_enabled(suffix: str = "") -> Iterator[bool]:
    """Capture an XLA trace when MLX_VLM_TPU_PROFILE_DIR is set.

    Yields True when tracing is active.  Traces are cumulative per process
    — one start/stop pair per context.
    """
    out = os.environ.get("MLX_VLM_TPU_PROFILE_DIR")
    if not out:
        yield False
        return
    path = os.path.join(out, suffix) if suffix else out
    jax.profiler.start_trace(path)
    try:
        yield True
    finally:
        jax.profiler.stop_trace()


def phase_timer() -> PhaseTimer:
    """A fresh per-request timer."""
    return PhaseTimer()

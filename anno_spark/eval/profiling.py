"""Timing instrumentation for evaluation runs.

Behavioral port of the reference profiler (reference:
anno/src/eval/profiling.rs:1-180): named start/stop timers, a closure
wrapper, per-operation count/total/avg/min/max summaries sorted by
total descending, and a module-level thread-local instance with no-op
semantics when disabled (the reference's feature flag becomes an
``enabled`` switch).

Driver-side tool by design: inside Spark tasks, per-stage timing
belongs to the Spark UI / event log, and the engine's pipeline metrics
(plans/pipeline.py) already record per-partition counts.  This
profiler times the ORCHESTRATION layer (harness loops, oracle
materialization, report assembly) exactly like the reference times its
evaluation loops.
"""

from __future__ import annotations

import threading
import time as _time
from dataclasses import dataclass

__all__ = ["Profiler", "TimingStats", "enable", "disable",
           "start", "stop", "time", "print_summary", "summary"]


@dataclass
class TimingStats:
    total: float  # seconds
    count: int
    avg: float
    min: float
    max: float


class Profiler:
    """Named timers with per-operation stats (profiling.rs:10-108)."""

    def __init__(self):
        self.timings: dict = {}
        self.current_timers: dict = {}

    def start(self, operation: str) -> None:
        self.current_timers[operation] = _time.perf_counter()

    def stop(self, operation: str) -> None:
        t0 = self.current_timers.pop(operation, None)
        if t0 is not None:
            self.timings.setdefault(operation, []).append(
                _time.perf_counter() - t0)

    def time(self, operation: str, fn):
        self.start(operation)
        try:
            return fn()
        finally:
            self.stop(operation)

    def summary(self) -> dict:
        out = {}
        for name, durations in self.timings.items():
            total = sum(durations)
            count = len(durations)
            out[name] = TimingStats(
                total=total, count=count,
                avg=total / count if count else 0.0,
                min=min(durations) if durations else 0.0,
                max=max(durations) if durations else 0.0)
        return out

    def render_summary(self) -> str:
        """Total-descending table (profiling.rs:82-108)."""
        lines = ["=== Profiling Summary ===",
                 f"{'Operation':<30} {'Count':>10} {'Total (ms)':>10} "
                 f"{'Avg (ms)':>10} {'Min (ms)':>10} {'Max (ms)':>10}",
                 "-" * 90]
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1].total):
            lines.append(
                f"{name:<30} {s.count:>10} {s.total * 1000:>10.2f} "
                f"{s.avg * 1000:>10.2f} {s.min * 1000:>10.2f} "
                f"{s.max * 1000:>10.2f}")
        return "\n".join(lines)


# module-level instance: thread-local like the reference's, behind an
# enabled flag standing in for the compile-time feature gate
_LOCAL = threading.local()
_ENABLED = False


def _profiler() -> Profiler:
    if not hasattr(_LOCAL, "profiler"):
        _LOCAL.profiler = Profiler()
    return _LOCAL.profiler


def enable() -> None:
    global _ENABLED
    _ENABLED = True


def disable() -> None:
    global _ENABLED
    _ENABLED = False


def start(operation: str) -> None:
    if _ENABLED:
        _profiler().start(operation)


def stop(operation: str) -> None:
    if _ENABLED:
        _profiler().stop(operation)


def time(operation: str, fn):
    """No-op passthrough when disabled (profiling.rs:170-176)."""
    if _ENABLED:
        return _profiler().time(operation, fn)
    return fn()


def summary() -> dict:
    return _profiler().summary() if _ENABLED else {}


def print_summary() -> None:
    if _ENABLED:
        import sys
        print(_profiler().render_summary(), file=sys.stderr)

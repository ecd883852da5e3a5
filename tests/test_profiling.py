"""Profiler port — reference semantics + the enabled/disabled gate.

Reference: anno/src/eval/profiling.rs."""

from __future__ import annotations

import time as _time

import pytest

from anno_spark.eval import profiling as P


def test_start_stop_records():
    p = P.Profiler()
    p.start("op")
    _time.sleep(0.01)
    p.stop("op")
    s = p.summary()["op"]
    assert s.count == 1
    assert s.total >= 0.01
    assert s.min <= s.avg <= s.max


def test_stop_without_start_is_noop():
    p = P.Profiler()
    p.stop("never_started")
    assert p.summary() == {}


def test_time_wrapper_returns_value_and_records_on_raise():
    p = P.Profiler()
    assert p.time("op", lambda: 42) == 42
    with pytest.raises(RuntimeError):
        p.time("boom", _raise)
    # duration recorded even when the closure raises (finally)
    assert p.summary()["boom"].count == 1


def _raise():
    raise RuntimeError("x")


def test_summary_stats_multiple_calls():
    p = P.Profiler()
    for _ in range(3):
        p.time("op", lambda: None)
    s = p.summary()["op"]
    assert s.count == 3
    assert s.avg == pytest.approx(s.total / 3)


def test_render_summary_sorted_by_total():
    p = P.Profiler()
    p.time("fast", lambda: None)
    p.time("slow", lambda: _time.sleep(0.02))
    text = p.render_summary()
    assert text.index("slow") < text.index("fast")
    assert "Profiling Summary" in text


def test_module_gate_noop_when_disabled():
    P.disable()
    P.start("op")
    P.stop("op")
    assert P.time("op", lambda: 7) == 7
    assert P.summary() == {}


def test_module_gate_records_when_enabled():
    P.enable()
    try:
        P.time("gated", lambda: None)
        assert P.summary()["gated"].count >= 1
    finally:
        P.disable()

"""Evaluation report builder: reference-test parity and quirk pins.

Reference cases: anno/src/eval/report.rs:952-1000 plus the builder's
matching/recommendation rules.
"""

from __future__ import annotations

import pytest

from anno_spark.core.entity import Mention
from anno_spark.eval import report as R


def _mention(text, etype, start, end):
    return Mention(text, etype, start, end, 1.0, "t", "t")


def test_report_builder_with_real_backend():
    # reference test_report_builder_basic: RegexNER over the default
    # synthetic cases finds dates/emails/money
    from anno_spark.core import regex_ner

    rep = R.ReportBuilder("RegexNER").with_error_analysis(True) \
        .build(regex_ner.extract_entities)
    assert rep.model_name == "RegexNER"
    assert rep.core["total_gold"] > 0
    assert "Using synthetic test data" in rep.warnings[0]
    assert rep.core["recall"] > 0.0  # regex tier finds dates/emails


def test_summary_format():
    rep = R.EvalReport(
        "TestModel",
        {"precision": 0.85, "recall": 0.75, "f1": 0.80,
         "total_gold": 100, "total_predicted": 90, "total_correct": 75},
        {}, None, None, None, [], [])
    s = rep.summary()
    assert "TestModel" in s
    assert "85.0%" in s
    assert "75.0%" in s


def test_gold_side_any_match_quirk():
    # two identical golds, one matching prediction: BOTH golds count
    # correct (report.rs:586-605) — unlike the greedy evaluator
    cases = [R.TestCase("x", [("a", "PER", 0, 1), ("a", "PER", 0, 1)])]
    rep = R.ReportBuilder("m").with_test_data(cases).build(
        lambda text: [_mention("a", "PER", 0, 1)])
    assert rep.core["total_correct"] == 2
    assert rep.core["total_predicted"] == 1
    assert rep.core["recall"] == pytest.approx(1.0)
    assert rep.core["precision"] == pytest.approx(2.0)  # quirk: >1 possible


def test_recommendation_rules():
    # poor model -> High/performance; conservative -> Medium/coverage
    cases = [R.TestCase("x", [("a", "PER", 0, 1), ("b", "PER", 2, 3),
                              ("c", "PER", 4, 5), ("d", "PER", 6, 7)])]
    rep = R.ReportBuilder("m").with_test_data(cases).build(
        lambda text: [_mention("a", "PER", 0, 1)])
    prios = {r["priority"] for r in rep.recommendations}
    cats = {r["category"] for r in rep.recommendations}
    assert "medium" in prios and "coverage" in cats  # recall 0.25 < 0.7*1.0
    assert "high" in prios  # f1 = 0.4 < 0.5


def test_error_summary_top_patterns():
    cases = [R.TestCase("x", [(f"e{i}", "PER", i * 10, i * 10 + 2)
                              for i in range(8)])]
    rep = R.ReportBuilder("m").with_test_data(cases).build(lambda t: [])
    e = rep.errors
    assert e["false_negatives"] == 8
    assert e["false_positives"] == 0
    assert len(e["top_patterns"]) == 5  # first five missed
    assert e["top_patterns"][0] == "Missed: e0 (PER)"
    assert e["boundary_errors"] == 0  # reference hard-codes 0


def test_extraction_failure_warns_and_continues():
    def broken(text):
        raise RuntimeError("boom")

    cases = [R.TestCase("x", [("a", "PER", 0, 1)])]
    rep = R.ReportBuilder("m").with_test_data(cases).build(broken)
    assert any("Failed to extract" in w for w in rep.warnings)
    assert rep.core["total_predicted"] == 0


def test_data_quality_checks():
    cases = [
        R.TestCase("Same text", [("Apple", "ORG", 0, 5)]),
        R.TestCase("same TEXT", [("Apple", "LOC", 0, 5)]),  # dup + ambiguous
        R.TestCase("Other", [("Paris", "LOC", 0, 5)]),
    ]
    rep = R.ReportBuilder("m").with_data_quality(True) \
        .with_test_data(cases).build(lambda t: [])
    q = rep.data_quality
    assert q["redundancy_rate"] == pytest.approx(1 / 3)
    assert q["ambiguous_count"] == 1  # "apple" has ORG and LOC
    assert q["leakage_detected"] is False


def test_to_dict_roundtrip():
    rep = R.ReportBuilder("m").build(lambda t: [])
    d = rep.to_dict()
    assert d["model_name"] == "m"
    import json
    json.dumps(d)  # serializable

"""Confidence-threshold analysis (reference:
anno/src/eval/threshold_analysis.rs).

Layers: the five transcribed reference tests
(threshold_analysis.rs:356-434); a pure-python transcription of
ThresholdAnalyzer::analyze as a differential oracle over seeded random
prediction sets; quirk pins (last-max tie break, rev-scan high-recall
pick, empty-retained precision 1.0, num_points clamp); display-helper
parity smoke.
"""

from __future__ import annotations

import random

import pytest

from anno_spark.eval.threshold_analysis import (
    format_threshold_table,
    interpret_curve,
    predictions_df,
    threshold_curve,
    threshold_points,
)


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _points(spark, rows, n=20):
    return threshold_points(predictions_df(spark, rows), n).collect()


def _curve(spark, rows, n=20):
    out = threshold_curve(predictions_df(spark, rows), n).collect()
    assert len(out) == 1
    return out[0]


# ------------------------------------------------------------ transcribed


def test_perfect_predictions(spark):
    # threshold_analysis.rs:361-377
    rows = [("A", "T", 0.9, True), ("B", "T", 0.8, True), ("C", "T", 0.7, True)]
    for p in _points(spark, rows, 10):
        if p.num_predictions > 0:
            assert abs(p.precision - 1.0) < 0.01


def test_confidence_ordering(spark):
    # threshold_analysis.rs:379-395
    rows = [("High", "T", 0.95, True), ("Med", "T", 0.50, False), ("Low", "T", 0.20, False)]
    pts = _points(spark, rows, 10)
    high = next(p for p in pts if p.threshold >= 0.9)
    low = next(p for p in pts if p.threshold <= 0.1)
    assert high.precision >= low.precision


def test_empty_predictions(spark):
    # threshold_analysis.rs:397-406 — default curve, NO points
    assert _points(spark, []) == []
    c = _curve(spark, [])
    assert c.total_predictions == 0
    assert c.total_correct == 0
    assert c.optimal_threshold == 0.5
    assert c.optimal_f1 == 0.0
    assert c.auc_pr == 0.0
    assert c.high_precision_threshold is None
    assert c.high_recall_threshold is None


def test_optimal_threshold_found(spark):
    # threshold_analysis.rs:408-423
    rows = [
        ("A", "T", 0.9, True), ("B", "T", 0.8, True),
        ("C", "T", 0.3, False), ("D", "T", 0.2, False),
    ]
    c = _curve(spark, rows, 10)
    assert 0.3 <= c.optimal_threshold <= 0.9


def test_auc_pr_bounds(spark):
    # threshold_analysis.rs:425-434
    rows = [("A", "T", 0.9, True), ("B", "T", 0.5, False)]
    c = _curve(spark, rows)
    assert 0.0 <= c.auc_pr <= 1.0


# ------------------------------------------------------------ quirks


def test_optimal_tie_breaks_to_higher_threshold(spark):
    # Rust max_by keeps the LAST equal maximum — with one correct
    # prediction at 1.0 every threshold has P=R=F1=1.0, so the optimal
    # point is the top of the grid (threshold_analysis.rs:158-168).
    c = _curve(spark, [("A", "T", 1.0, True)], 10)
    assert c.optimal_f1 == 1.0
    assert c.optimal_threshold == pytest.approx(1.0)


def test_high_recall_is_highest_qualifying_threshold(spark):
    # .rev() scan: the HIGHEST threshold with recall >= 0.95, despite
    # the reference comment saying "lowest" (threshold_analysis.rs:180-186).
    rows = [("A", "T", 0.62, True), ("B", "T", 0.1, False)]
    c = _curve(spark, rows, 10)
    # recall is 1.0 while threshold <= 0.62, then 0: pick 0.6, not 0.0
    assert c.high_recall_threshold == pytest.approx(0.6)


def test_empty_retained_set_precision_one(spark):
    # above every confidence the retained set is empty: precision 1.0,
    # recall 0.0 (threshold_analysis.rs:216-226)
    rows = [("A", "T", 0.15, True)]
    pts = _points(spark, rows, 10)
    top = pts[-1]
    assert top.num_predictions == 0
    assert top.precision == 1.0
    assert top.recall == 0.0
    assert top.f1 == 0.0


def test_num_points_clamped_to_five(spark):
    # ThresholdAnalyzer::new(2).num_points == 5 (threshold_analysis.rs:121-125)
    pts = _points(spark, [("A", "T", 0.5, True)], 2)
    assert len(pts) == 6  # 0.0 .. 1.0 in fifths


def test_grid_uses_reference_float_arithmetic(spark):
    # thresholds are i * (1.0/num_points) in f64 — e.g. 20 points puts
    # 0.15000000000000002 at i=3, so a 0.15-confidence prediction is
    # NOT retained there. Bit-level parity with the Rust loop.
    rows = [("A", "T", 0.15, True)]
    pts = _points(spark, rows, 20)
    assert pts[3].threshold == 3 * (1.0 / 20)
    assert pts[3].num_predictions == 0
    assert pts[2].num_predictions == 1


# ------------------------------------------------------------ differential


def _ref_analyze(rows, num_points):
    """Pure-python transcription of ThresholdAnalyzer::analyze
    (threshold_analysis.rs:130-266). rows: (confidence, is_correct)."""
    num_points = max(num_points, 5)
    if not rows:
        return None, []
    total_correct = sum(1 for _, ok in rows if ok)
    step = 1.0 / num_points
    points = []
    for i in range(num_points + 1):
        t = i * step
        retained = [(c, ok) for c, ok in rows if c >= t]
        np_, nc = len(retained), sum(1 for _, ok in retained if ok)
        precision = 1.0 if np_ == 0 else nc / np_
        recall = 1.0 if total_correct == 0 else nc / total_correct
        f1 = (
            0.0
            if precision + recall == 0.0
            else 2.0 * precision * recall / (precision + recall)
        )
        points.append(dict(
            threshold=t, precision=precision, recall=recall, f1=f1,
            num_predictions=np_, num_correct=nc,
        ))
    optimal = points[0]
    for p in points:
        if p["f1"] >= optimal["f1"]:
            optimal = p
    by_recall = sorted(points, key=lambda p: -p["recall"])
    auc = sum(
        (a["recall"] - b["recall"]) * (a["precision"] + b["precision"]) / 2.0
        for a, b in zip(by_recall, by_recall[1:])
    ) if len(by_recall) >= 2 else 0.0
    high_p = next(
        (p["threshold"] for p in points
         if p["precision"] >= 0.95 and p["num_predictions"] > 0),
        None,
    )
    high_r = next(
        (p["threshold"] for p in reversed(points) if p["recall"] >= 0.95), None
    )
    curve = dict(
        optimal_threshold=optimal["threshold"], optimal_f1=optimal["f1"],
        optimal_precision=optimal["precision"], optimal_recall=optimal["recall"],
        auc_pr=auc, total_predictions=len(rows), total_correct=total_correct,
        high_precision_threshold=high_p, high_recall_threshold=high_r,
    )
    return curve, points


@pytest.mark.parametrize("seed,n_points", [(0, 20), (1, 10), (2, 7)])
def test_differential_random_predictions(spark, seed, n_points):
    rng = random.Random(seed)
    rows = [
        (f"e{i}", "T", round(rng.random(), 3), rng.random() < 0.6)
        for i in range(80)
    ]
    exp_curve, exp_points = _ref_analyze([(c, ok) for _, _, c, ok in rows], n_points)

    pts = _points(spark, rows, n_points)
    assert len(pts) == len(exp_points)
    for got, exp in zip(pts, exp_points):
        assert got.threshold == exp["threshold"]  # identical f64 grid
        assert got.num_predictions == exp["num_predictions"]
        assert got.num_correct == exp["num_correct"]
        assert got.precision == pytest.approx(exp["precision"], rel=1e-12)
        assert got.recall == pytest.approx(exp["recall"], rel=1e-12)
        assert got.f1 == pytest.approx(exp["f1"], rel=1e-12)

    c = _curve(spark, rows, n_points)
    for k, v in exp_curve.items():
        got = getattr(c, k)
        if v is None:
            assert got is None
        else:
            assert got == pytest.approx(v, rel=1e-12)


# ------------------------------------------------------------ display


def test_display_helpers(spark):
    rows = [
        ("A", "T", 0.9, True), ("B", "T", 0.8, True),
        ("C", "T", 0.3, False), ("D", "T", 0.2, False),
    ]
    pts = _points(spark, rows, 10)
    c = _curve(spark, rows, 10)
    table = format_threshold_table(pts, c)
    assert "Threshold   Precision   Recall      F1    Predictions" in table
    assert f"Optimal: threshold={c.optimal_threshold:.2f}" in table
    assert "AUC-PR:" in table
    insights = interpret_curve(c)
    assert any("calibration" in s for s in insights)
    assert any("95%" in s for s in insights)

"""Learning-curve analysis (reference: anno/src/eval/learning_curve.rs).

Layers: the five transcribed reference tests
(learning_curve.rs:405-574); quirk pins (R² scored without the +c
offset, ×2.5 truncated size ladder, first-achiever and truncating
extrapolation, saturation edges); the Spark feeder differentially
checked against independent per-subset PRF jobs.
"""

from __future__ import annotations

import math

import pytest

from anno_spark.eval.learning_curve import (
    DataPoint,
    analyze,
    as_data_points,
    estimate_samples_for_f1,
    fit_power_law,
    learning_curve_points,
    suggested_train_sizes,
)

ENT_SCHEMA = "url string, start int, end int, entity_type string"


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _pts(*tuples):
    return [DataPoint(s, f, p, r) for s, f, p, r in tuples]


# ------------------------------------------------------------ transcribed


def test_basic_analysis():
    # learning_curve.rs:407-446
    points = _pts(
        (100, 0.60, 0.65, 0.55), (500, 0.75, 0.78, 0.72),
        (1000, 0.82, 0.84, 0.80), (2000, 0.85, 0.86, 0.84),
    )
    a = analyze(points)
    assert a.efficiency.f1_per_100_samples > 0.0
    assert a.recommendations


def test_saturation_detection():
    # learning_curve.rs:448-495
    points = _pts(
        (100, 0.50, 0.50, 0.50), (200, 0.70, 0.70, 0.70),
        (400, 0.80, 0.80, 0.80), (800, 0.82, 0.82, 0.82),
        (1600, 0.83, 0.83, 0.83), (3200, 0.835, 0.835, 0.835),
    )
    assert analyze(points).efficiency.saturation_level > 0.5


def test_suggested_train_sizes():
    # learning_curve.rs:497-508
    sizes = suggested_train_sizes(10000)
    assert sizes
    assert sizes[0] == 10
    assert sizes[-1] == 10000
    assert all(b > a for a, b in zip(sizes, sizes[1:]))


def test_more_data_would_help():
    # learning_curve.rs:510-560 — linear improvement = low saturation
    points = _pts(
        (100, 0.40, 0.40, 0.40), (200, 0.48, 0.48, 0.48),
        (400, 0.56, 0.56, 0.56), (800, 0.64, 0.64, 0.64),
        (1600, 0.72, 0.72, 0.72), (3200, 0.80, 0.80, 0.80),
    )
    a = analyze(points)
    assert a.efficiency.saturation_level < 0.5
    assert a.more_data_would_help()


def test_empty_data():
    # learning_curve.rs:562-570
    a = analyze([])
    assert a.efficiency.f1_per_100_samples == 0.0
    assert a.curve_fit is None


# ------------------------------------------------------------ quirks


def test_suggested_sizes_truncating_ladder():
    # (size * 2.5) as usize: 10, 25, 62, 155, 387, 967…
    # (learning_curve.rs:381-395)
    assert suggested_train_sizes(1000) == [10, 25, 62, 155, 387, 967, 1000]
    assert suggested_train_sizes(10) == [10]
    assert suggested_train_sizes(5) == [5]  # loop never runs; max appended


def test_first_achiever_wins_over_extrapolation():
    # learning_curve.rs:180-185
    points = _pts(
        (100, 0.50, 0.5, 0.5), (200, 0.85, 0.85, 0.85), (400, 0.90, 0.9, 0.9)
    )
    assert estimate_samples_for_f1(points, 0.85) == 200
    assert estimate_samples_for_f1(points, 0.90) == 400


def test_extrapolation_truncates_to_int():
    # x = ((target − c)/a)^(1/b) as usize (learning_curve.rs:188-199)
    points = _pts(
        (100, 0.60, 0.6, 0.6), (400, 0.70, 0.7, 0.7), (1600, 0.80, 0.8, 0.8)
    )
    fit = fit_power_law(points)
    assert fit is not None
    target = 0.95
    diff = target - fit.c
    if diff > 0.0 and fit.a > 0.0 and fit.b != 0.0:
        expect = int((diff / fit.a) ** (1.0 / fit.b))
        assert estimate_samples_for_f1(points, target) == expect


def test_r_squared_ignores_c_offset():
    # R² residuals use a·x^b WITHOUT + c (learning_curve.rs:283-295) —
    # recompute by hand and match
    points = _pts(
        (100, 0.60, 0.6, 0.6), (400, 0.70, 0.7, 0.7), (1600, 0.80, 0.8, 0.8)
    )
    fit = fit_power_law(points)
    y = [p.f1 for p in points]
    y_mean = sum(y) / len(y)
    ss_tot = sum((yi - y_mean) ** 2 for yi in y)
    ss_res = sum(
        (p.f1 - fit.a * p.train_size**fit.b) ** 2 for p in points
    )
    assert fit.r_squared == pytest.approx(max(1.0 - ss_res / ss_tot, 0.0))
    # and c is last F1 × 1.05 capped at 1.0 (learning_curve.rs:279-281)
    assert fit.c == pytest.approx(min(0.80 * 1.05, 1.0))


def test_saturation_edges():
    from anno_spark.eval.learning_curve import _compute_saturation

    # flat from the start: initial improvement <= 0 -> 1.0
    flat = _pts((100, 0.8, 0.8, 0.8), (200, 0.8, 0.8, 0.8), (400, 0.8, 0.8, 0.8))
    assert _compute_saturation(flat) == 1.0
    # < 3 points -> 0.0
    assert _compute_saturation(flat[:2]) == 0.0


def test_diminishing_returns_threshold():
    points = _pts(
        (100, 0.50, 0.5, 0.5), (200, 0.70, 0.7, 0.7),
        (400, 0.705, 0.705, 0.705), (800, 0.71, 0.71, 0.71),
    )
    a = analyze(points)
    # 200 -> 400 doubles with +0.005 F1: threshold = 200
    assert a.efficiency.diminishing_returns_threshold == 200


# ------------------------------------------------------------ Spark feeder


def _corpus(spark, n_cases=40):
    """Pred/gold with controlled degradation: even cases perfect, odd
    cases have one FP and one FN."""
    gold_rows, pred_rows = [], []
    for i in range(n_cases):
        u = f"u{i:03d}"
        gold_rows += [(u, 0, 4, "PER"), (u, 10, 14, "ORG")]
        pred_rows.append((u, 0, 4, "PER"))
        if i % 2 == 0:
            pred_rows.append((u, 10, 14, "ORG"))
        else:
            pred_rows.append((u, 20, 24, "LOC"))  # FP; ORG missed
    return (
        spark.createDataFrame(pred_rows, ENT_SCHEMA),
        spark.createDataFrame(gold_rows, ENT_SCHEMA),
    )


def test_feeder_matches_per_subset_prf(spark):
    from pyspark.sql import functions as F

    from anno_spark.eval.ner_eval import ner_prf_exact_df

    pred, gold = _corpus(spark)
    sizes = [5, 10, 20, 40]
    pts = learning_curve_points(pred, gold, sizes, seed=7).collect()
    assert [r.train_size for r in pts] == sizes

    # independently recompute each subset with the standalone PRF job,
    # using the same hash-prefix membership
    ranked = (
        gold.select("url").distinct()
        .withColumn("_h", F.xxhash64(F.lit(7), F.col("url")))
        .orderBy("_h", "url")
        .collect()
    )
    order = [r.url for r in ranked]
    for row in pts:
        subset = set(order[: row.train_size])
        p_sub = pred.where(F.col("url").isin(subset))
        g_sub = gold.where(F.col("url").isin(subset))
        exp = ner_prf_exact_df(p_sub, g_sub).collect()[0]
        assert row.n_pred == exp.n_pred, row.train_size
        assert row.n_gold == exp.n_gold
        assert row.n_matched == exp.n_matched
        assert row.f1 == pytest.approx(exp.f1, abs=1e-6)


def test_feeder_nested_prefixes_monotone(spark):
    pred, gold = _corpus(spark)
    pts = learning_curve_points(pred, gold, [10, 20, 40], seed=1).collect()
    golds = [r.n_gold for r in pts]
    assert golds == sorted(golds)
    assert golds[-1] == 80  # all 40 cases x 2 gold entities


def test_feeder_feeds_analyzer(spark):
    pred, gold = _corpus(spark)
    df = learning_curve_points(pred, gold, [5, 10, 20, 40], seed=7)
    a = analyze(as_data_points(df))
    assert len(a.data_points) == 4
    assert a.curve_fit is not None
    assert a.recommendations
    assert 0.0 <= a.efficiency.saturation_level <= 1.0

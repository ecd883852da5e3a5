"""Confusion matrix / significance test / confidence types — reference
test transcription + Spark differential for the distributed matrix.

Reference cases: anno/src/eval/analysis.rs:596-640 tests;
anno/src/types/{confidence,score}.rs doc contracts.
"""

from __future__ import annotations

import math

import pytest

from anno_spark.core.confidence import (Confidence, Score,
                                        combine_confidence_expr,
                                        lerp_expr, sigmoid_expr)
from anno_spark.eval import analysis as A


# ---------------------------------------------------------------------------
# confusion matrix (analysis.rs tests)


def test_confusion_matrix_counts_and_precision():
    cm = A.ConfusionMatrix()
    cm.add("PER", "PER")
    cm.add("PER", "PER")
    cm.add("PER", "ORG")
    cm.add("ORG", "ORG")
    assert cm.get("PER", "PER") == 2
    assert cm.get("PER", "ORG") == 1
    assert cm.get("ORG", "ORG") == 1
    assert cm.precision("PER") == pytest.approx(2 / 3)
    assert cm.recall("ORG") == pytest.approx(1 / 2)


def test_most_confused():
    cm = A.ConfusionMatrix()
    cm.add("PER", "ORG")
    cm.add("PER", "ORG")
    cm.add("LOC", "ORG")
    confused = cm.most_confused(2)
    assert len(confused) == 2
    assert confused[0] == ("PER", "ORG", 2)


def test_build_confusion_matrix_spurious_quirk():
    # overlap match feeds the matrix; unmatched gold -> MISSED row;
    # spurious predictions vanish entirely (analysis.rs:553-588)
    preds = [(0, 4, "PER"), (100, 104, "ORG")]   # second is spurious
    golds = [(0, 4, "LOC"), (50, 54, "DATE")]    # second is missed
    cm = A.build_confusion_matrix([(preds, golds)])
    assert cm.get("PER", "LOC") == 1
    assert cm.get("MISSED", "DATE") == 1
    assert cm.predicted_totals.get("ORG", 0) == 0  # spurious absent
    assert "MISSED" in cm.render()


def test_confusion_matrix_df_matches_local(spark):
    rows_p = [("d1", 0, 4, "PER"), ("d1", 100, 104, "ORG"),
              ("d2", 0, 5, "LOC"), ("d3", 2, 6, "PER")]
    rows_g = [("d1", 0, 4, "LOC"), ("d1", 50, 54, "DATE"),
              ("d2", 0, 5, "LOC"), ("d4", 0, 3, "ORG")]
    pred = spark.createDataFrame(
        rows_p, "url string, start long, end long, entity_type string")
    gold = spark.createDataFrame(
        rows_g, "url string, start long, end long, entity_type string")
    got = A.confusion_matrix_df(pred, gold)

    from collections import defaultdict
    per_doc = defaultdict(lambda: ([], []))
    for (u, s, e, t) in rows_p:
        per_doc[u][0].append((s, e, t))
    for (u, s, e, t) in rows_g:
        per_doc[u][1].append((s, e, t))
    want = A.build_confusion_matrix(
        [(sorted(p), sorted(g)) for (p, g) in per_doc.values()])
    for t1 in set(got.types()) | set(want.types()):
        for t2 in set(got.types()) | set(want.types()):
            assert got.get(t1, t2) == want.get(t1, t2), (t1, t2)


# ---------------------------------------------------------------------------
# significance test


def test_significance_direction():
    a = [0.85, 0.82, 0.88, 0.79, 0.84]
    b = [0.78, 0.76, 0.82, 0.74, 0.79]
    t = A.compare_ner_systems("A", a, "B", b)
    assert t.mean_a > t.mean_b
    assert t.difference > 0.0
    assert t.n == 5


def test_significance_p_value_buckets():
    # the reference's coarse buckets (analysis.rs:506-517): consistent
    # large differences cross the df<30 critical values
    a = [0.9] * 10
    b = [0.5 + 0.001 * i for i in range(10)]
    t = A.paired_t_test("A", a, "B", b)
    assert t.p_value == pytest.approx(0.005)
    assert t.significant_01
    same = A.paired_t_test("A", [0.8, 0.81, 0.79], "B", [0.8, 0.8, 0.81])
    assert same.p_value in (0.10, 0.03, 0.005)


def test_significance_small_n():
    t = A.paired_t_test("A", [0.9], "B", [0.5])
    assert t.p_value == 1.0
    assert t.difference == 0.0
    assert not t.significant_05
    with pytest.raises(ValueError):
        A.paired_t_test("A", [0.9], "B", [0.5, 0.6])


def test_zero_variance_gives_zero_t():
    t = A.paired_t_test("A", [0.8, 0.8], "B", [0.7, 0.7])
    assert t.t_statistic == 0.0  # std_error == 0 path


# ---------------------------------------------------------------------------
# confidence / score types


def test_confidence_new_bounds():
    assert Confidence.new(0.5).get() == 0.5
    assert Confidence.new(-0.1) is None
    assert Confidence.new(1.1) is None
    assert Confidence.new(float("nan")) is None


def test_confidence_saturating_and_nan():
    assert Confidence.saturating(2.0).get() == 1.0
    assert Confidence.saturating(-1.0).get() == 0.0
    assert Confidence.saturating(float("nan")).get() == 0.0


def test_confidence_percent_high_low():
    c = Confidence.from_percent(95.0)
    assert c.get() == pytest.approx(0.95)
    assert c.as_percent() == pytest.approx(95.0)
    assert c.is_high()
    assert not c.is_low()
    assert Confidence.new(0.4).is_low()


def test_confidence_lerp_combine():
    a, b = Confidence(0.2), Confidence(0.8)
    assert a.lerp(b, 0.0).get() == pytest.approx(0.2)
    assert a.lerp(b, 1.0).get() == pytest.approx(0.8)
    assert a.lerp(b, 0.5).get() == pytest.approx(0.5)
    assert a.lerp(b, 5.0).get() == pytest.approx(0.8)  # t clamped
    assert a.combine(b).get() == pytest.approx(math.sqrt(0.16))


def test_score_from_logit():
    assert Score.from_logit(0.0).get() == pytest.approx(0.5)
    assert Score.from_logit(100.0).get() == pytest.approx(1.0)
    # temperature: T>1 softer, T<=0 unscaled (score.rs:92-100)
    sharp = Score.from_logit_with_temperature(2.0, 0.5)
    soft = Score.from_logit_with_temperature(2.0, 4.0)
    assert sharp.get() > Score.from_logit(2.0).get() > soft.get()
    assert Score.from_logit_with_temperature(2.0, 0.0).get() == \
        Score.from_logit(2.0).get()
    assert Score.from_logit(1.5).to_confidence().get() == \
        pytest.approx(Score.from_logit(1.5).get(), abs=1e-7)


def test_score_passes():
    assert Score(0.75).passes(0.7)
    assert not Score(0.65).passes(0.7)


def test_confidence_exprs_match_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, -2.0, 0.3, 0.9), (2, 0.0, 0.5, 0.5), (3, 3.5, 0.1, 0.7)],
        "id long, logit double, ca double, cb double")
    out = df.select(
        "id",
        sigmoid_expr("logit").alias("sig"),
        sigmoid_expr("logit", temperature=2.0).alias("sig_t"),
        combine_confidence_expr("ca", "cb").alias("comb"),
        lerp_expr("ca", "cb", 0.25).alias("lerp"),
    ).collect()
    for r in out:
        row = df.where(F.col("id") == r.id).collect()[0]
        assert r.sig == pytest.approx(Score.from_logit(row.logit).get())
        assert r.sig_t == pytest.approx(
            Score.from_logit_with_temperature(row.logit, 2.0).get())
        assert r.comb == pytest.approx(
            Confidence(row.ca).combine(Confidence(row.cb)).get())
        assert r.lerp == pytest.approx(
            Confidence(row.ca).lerp(Confidence(row.cb), 0.25).get())


def test_zero_variance_nonzero_gap_quirk():
    # a perfectly consistent gap has zero diff variance -> t=0, p=0.10,
    # "not significant" (analysis.rs:482-486) — reference quirk, pinned.
    # Exactly-representable values (0.75, 0.5) keep the variance at a
    # true 0.0; non-representable gaps (0.85 vs 0.80) accumulate ~1e-17
    # variance through the mean and blow up t instead — in the
    # reference's f64 math just as here.
    t = A.paired_t_test("A", [0.75] * 50, "B", [0.5] * 50)
    assert t.difference == pytest.approx(0.25)
    assert t.t_statistic == 0.0
    assert t.p_value == 0.10
    assert not t.significant_05

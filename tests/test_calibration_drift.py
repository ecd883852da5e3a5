"""Calibration + drift eval operators (reference transcriptions:
anno/src/eval/calibration.rs:337-430 test vectors;
anno/src/eval/drift.rs:556-647 detector scenarios)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _preds(spark, rows):
    return spark.createDataFrame(
        [(float(c), bool(k)) for c, k in rows], "confidence double, correct boolean"
    )


def _relia(spark, rows):
    from anno_spark.eval.calibration import reliability_table

    return reliability_table(_preds(spark, rows)).collect()


class TestCalibration:
    def test_perfect_calibration_low_ece(self, spark):
        # calibration.rs:341-363 — 90% accuracy at 0.9 confidence
        rows = [(0.9, True)] * 9 + [(0.9, False)]
        out = _relia(spark, rows)
        assert len(out) == 1
        assert out[0]["ece"] < 0.1
        assert out[0]["bin"] == 9
        assert out[0]["accuracy"] == 0.9
        assert out[0]["total_predictions"] == 10

    def test_overconfident_high_ece(self, spark):
        # calibration.rs:365-383 — 20% accuracy at 0.95 confidence
        rows = [(0.95, False)] * 4 + [(0.95, True)]
        out = _relia(spark, rows)
        assert out[0]["ece"] > 0.5
        assert out[0]["mce"] == out[0]["ece"]  # single bin

    def test_confidence_gap(self, spark):
        # calibration.rs:385-410
        rows = [(0.95, True), (0.90, True), (0.85, True),
                (0.30, False), (0.25, False), (0.20, False)]
        out = _relia(spark, rows)
        r = out[0]
        assert r["avg_confidence_correct"] > 0.8
        assert r["avg_confidence_incorrect"] < 0.4
        assert r["confidence_gap"] > 0.4

    def test_ece_weighted_over_bins_and_brier(self, spark):
        # hand-computed: bin7 = (0.75, acc 1.0, n 2, err .25);
        # bin2 = (0.25, acc 0.0, n 2, err .25) → ece = .25;
        # brier = mean((.75-1)², (.75-1)², (.25-0)², (.25-0)²) = .0625
        rows = [(0.75, True), (0.75, True), (0.25, False), (0.25, False)]
        out = {r["bin"]: r for r in _relia(spark, rows)}
        assert set(out) == {7, 2}
        assert out[7]["ece"] == 0.25
        assert out[7]["brier_score"] == 0.0625
        assert out[7]["calibration_error"] == 0.25
        assert out[7]["range_start"] == 0.7 and out[7]["range_end"] == 0.8

    def test_conf_one_lands_in_top_bin(self, spark):
        # calibration.rs:176 — min(int(conf·10), 9)
        out = _relia(spark, [(1.0, True)])
        assert out[0]["bin"] == 9

    def test_threshold_metrics(self, spark):
        # calibration.rs:412-427 — at 0.80: both kept correct, coverage .4
        from anno_spark.eval.calibration import threshold_metrics

        rows = [(0.95, True), (0.85, True), (0.75, False),
                (0.65, True), (0.55, False)]
        out = {r["threshold"]: r for r in threshold_metrics(_preds(spark, rows)).collect()}
        assert out[0.8]["accuracy"] == 1.0
        assert out[0.8]["coverage"] == 0.4
        assert out[0.5]["count"] == 5


def _drift(spark, rows, **kw):
    from anno_spark.eval.drift import drift_report

    df = spark.createDataFrame(
        rows, "window int, entity_type string, confidence double, surface string"
    )
    return drift_report(df, surface_col="surface", **kw).collect()[0]


class TestDrift:
    def test_no_drift(self, spark):
        # drift.rs:571-587 — consistent predictions
        rows = [(w, "PER", 0.90, "John Smith") for w in (0, 1) for _ in range(10)]
        r = _drift(spark, rows)
        assert not r["conf_drift_significant"]
        assert r["drift_amount"] == 0.0
        assert r["kl_divergence"] == 0.0
        assert r["n_new_types"] == 0
        assert r["new_token_rate"] == 0.0

    def test_confidence_drift_negative_and_significant(self, spark):
        # drift.rs:590-614 — 0.95 → 0.60
        rows = [(0, "PER", 0.95, "John")] * 10 + [(1, "PER", 0.60, "John")] * 10
        r = _drift(spark, rows, confidence_drift_threshold=0.1)
        assert r["conf_drift_significant"]
        assert r["drift_amount"] < 0
        assert r["drift_amount"] == -0.35

    def test_new_type_and_kl(self, spark):
        import math

        rows = (
            [(0, "ORG", 0.8, "Acme"), (0, "PER", 0.75, "John")] * 5
            + [(1, "ORG", 0.8, "Acme"), (1, "PER", 0.75, "John"),
               (1, "LOC", 0.8, "Paris")] * 5
        )
        r = _drift(spark, rows)
        assert r["n_new_types"] == 1
        # ORG and PER shares drop 1/2 → 1/3 (−1/6 < −0.05)
        assert r["n_decreased_types"] == 2
        assert r["n_increased_types"] == 0
        third = 1.0 / 3.0
        expect = 2 * third * math.log(third / 0.5) + third * math.log(third / 1e-10)
        assert abs(r["kl_divergence"] - round(expect, 6)) < 1e-6
        # Paris is the only new surface among 3 current
        assert r["new_token_rate"] == round(1 / 3, 6)

    def test_baseline_vs_current_are_min_and_max_windows(self, spark):
        # middle windows are ignored (drift.rs compares first vs last)
        rows = [(0, "PER", 0.9, "a")] * 4 + [(5, "PER", 0.4, "b")] * 4 \
            + [(2, "PER", 0.1, "c")] * 4
        r = _drift(spark, rows)
        assert r["baseline_mean_conf"] == 0.9
        assert r["current_mean_conf"] == 0.4


class TestProbeTemplates:
    """The Spark probe queries' planted templates, pinned at core level
    (same discipline as tests/test_probe_oracles.py): expected mentions
    with exact offsets and confidences at every doc_id regime."""

    @pytest.mark.parametrize("did", [0, 1, 2, 3, 4, 5, 15, 23, 24, 37])
    def test_calibration_template(self, did):
        from __spark_entry__ import _PROBE_LOCS, _PROBE_ORGS, _PROBE_PERSONS
        from anno_spark.core.document import extract_document

        o = _PROBE_ORGS[did % 24]
        p = _PROBE_PERSONS[(did // 2) % 16]
        loc = _PROBE_LOCS[(did // 2) % 15]
        orgtext = o + " Corp" if did % 2 == 0 else o
        text = (
            f"on monday {orgtext} told reporters that {p} "
            f"was pleased in {loc}."
        )
        got = [
            (m.text, m.entity_type, m.start, m.end, m.confidence)
            for m in extract_document(text).mentions
        ]
        lo = len(orgtext)
        assert got == [
            (orgtext, "ORG", 10, 10 + lo, 0.85 if did % 2 == 0 else 0.8),
            (p, "PER", 31 + lo, 31 + lo + len(p), 0.75),
            (loc, "LOC", 47 + lo + len(p), 47 + lo + len(p) + len(loc), 0.8),
        ]

    @pytest.mark.parametrize("did", [0, 2, 8, 46])
    def test_drift_window0_template(self, did):
        from __spark_entry__ import _PROBE_ORGS, _PROBE_PERSONS
        from anno_spark.core.document import extract_document

        o = _PROBE_ORGS[did % 24]
        p = _PROBE_PERSONS[(did // 2) % 16]
        text = f"on monday {o} told reporters that {p} was pleased."
        got = [
            (m.text, m.entity_type, m.confidence)
            for m in extract_document(text).mentions
        ]
        assert got == [(o, "ORG", 0.8), (p, "PER", 0.75)]

"""Long-tail analysis (reference: anno/src/eval/long_tail.rs).

Layers: transcribed reference unit tests (long_tail.rs:440-527); a
pure-python transcription of analyze() as a differential oracle; the
small-n bucket-overlap quirk; end-to-end over planted pred/gold
mention frames through ner_prf_by_type_df.
"""

from __future__ import annotations

import math

import pytest

from anno_spark.eval.long_tail import (
    bucket_by_frequency,
    format_long_tail_results,
    frequency_split,
    insights,
    long_tail_report,
)

PT_SCHEMA = (
    "entity_type string, count long, precision double, recall double, f1 double"
)


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _per_type_df(spark, rows):
    return spark.createDataFrame(rows, PT_SCHEMA)


# ------------------------------------------------------------ transcribed


def test_frequency_split(spark):
    # long_tail.rs:445-463 — 5 types at 20%: head=1 (A), tail=1 (E)
    rows = [
        ("A", 100, 0.0, 0.0, 0.0),
        ("B", 80, 0.0, 0.0, 0.0),
        ("C", 60, 0.0, 0.0, 0.0),
        ("D", 40, 0.0, 0.0, 0.0),
        ("E", 20, 0.0, 0.0, 0.0),
    ]
    b = {
        r.entity_type: r.bucket
        for r in bucket_by_frequency(_per_type_df(spark, rows), 0.2).collect()
    }
    assert b == {"A": "Head", "B": "Mid", "C": "Mid", "D": "Mid", "E": "Tail"}
    split = {r.bucket: r for r in frequency_split(_per_type_df(spark, rows), 0.2).collect()}
    assert split["Head"].types == ["A"]
    assert split["Tail"].types == ["E"]
    assert split["Mid"].types == ["B", "C", "D"]
    assert split["Head"].coverage == pytest.approx(100 / 300)


def test_gini_coefficient(spark):
    # long_tail.rs:465-474
    equal = [("A", 1, 0.5, 0.5, 0.5), ("B", 1, 0.5, 0.5, 0.5),
             ("C", 1, 0.5, 0.5, 0.5), ("D", 1, 0.5, 0.5, 0.5)]
    _, s = long_tail_report(_per_type_df(spark, equal))
    assert s.collect()[0].gini_coefficient < 0.01
    unequal = [("A", 1, 1.0, 1.0, 1.0), ("B", 1, 0.0, 0.0, 0.0),
               ("C", 1, 0.0, 0.0, 0.0), ("D", 1, 0.0, 0.0, 0.0)]
    _, s = long_tail_report(_per_type_df(spark, unequal))
    assert s.collect()[0].gini_coefficient > 0.5


def test_analyze_long_tail(spark):
    # long_tail.rs:476-496
    rows = [
        ("PER", 100, 0.9, 0.85, 0.87),
        ("ORG", 80, 0.8, 0.75, 0.77),
        ("LOC", 60, 0.7, 0.65, 0.67),
        ("DATE", 40, 0.6, 0.55, 0.57),
        ("DISEASE", 20, 0.3, 0.25, 0.27),
    ]
    _, summary = long_tail_report(_per_type_df(spark, rows), 0.2)
    s = summary.collect()[0]
    assert s.head_f1 > s.tail_f1
    assert s.tail_f1 < 0.5
    assert s.head_tail_gap > 0.3


def test_empty_input(spark):
    per, summary = long_tail_report(_per_type_df(spark, []))
    assert per.count() == 0
    s = summary.collect()[0]
    assert s.n_types == 0
    assert s.head_f1 == 0.0 and s.gini_coefficient == 0.0
    assert insights(s, []) == ["No entity types to analyze"]


def test_bucket_assignment_33pct(spark):
    # long_tail.rs:506-526 — 3 types at 33%: A Head, C Tail
    rows = [("A", 100, 0, 0, 0.0), ("B", 50, 0, 0, 0.0), ("C", 10, 0, 0, 0.0)]
    rows = [(t, c, 0.0, 0.0, f) for t, c, _, _, f in rows]
    b = {
        r.entity_type: r.bucket
        for r in bucket_by_frequency(_per_type_df(spark, rows), 0.33).collect()
    }
    assert b["A"] == "Head"
    assert b["B"] == "Mid"
    assert b["C"] == "Tail"


# ------------------------------------------------------- quirks & clamps


def test_single_type_lands_in_head(spark):
    # head checked before tail when cutoffs overlap (long_tail.rs:188-199)
    b = bucket_by_frequency(
        _per_type_df(spark, [("ONLY", 5, 1.0, 1.0, 1.0)]), 0.2
    ).collect()
    assert b[0].bucket == "Head"


def test_two_types_head_and_head(spark):
    # n=2, pct=0.4 (max clamp): head_cutoff=1, tail_cutoff=1 →
    # rank0 Head, rank1 Tail
    b = {
        r.entity_type: r.bucket
        for r in bucket_by_frequency(
            _per_type_df(spark, [("X", 9, 0.0, 0.0, 0.0), ("Y", 1, 0.0, 0.0, 0.0)]),
            0.9,  # clamped to 0.4
        ).collect()
    }
    assert b == {"X": "Head", "Y": "Tail"}


def test_tie_break_by_type_name(spark):
    # equal counts: deterministic entity_type-ascending order
    rows = [("B", 10, 0.0, 0.0, 0.0), ("A", 10, 0.0, 0.0, 0.0),
            ("C", 10, 0.0, 0.0, 0.0)]
    b = {
        r.entity_type: r.bucket
        for r in bucket_by_frequency(_per_type_df(spark, rows), 0.2).collect()
    }
    assert b == {"A": "Head", "B": "Mid", "C": "Tail"}


# -------------------------------------------------------- differential


def _rust_analyze(type_metrics, pct):
    """Literal transcription of analyze() (long_tail.rs:243-380) with
    the port's documented tie-break (count desc, type asc)."""
    pct = min(max(pct, 0.05), 0.4)
    n = len(type_metrics)
    if n == 0:
        return None
    order = sorted(type_metrics, key=lambda t: (-t[1], t[0]))
    head_cutoff = math.ceil(n * pct)
    tail_cutoff = n - head_cutoff
    bucket = {}
    for i, t in enumerate(order):
        bucket[t[0]] = (
            "Head" if i < head_cutoff else "Tail" if i >= tail_cutoff else "Mid"
        )
    def avg(vals):
        return sum(vals) / len(vals) if vals else 0.0
    head_f1 = avg([f for name, _, _, _, f in type_metrics if bucket[name] == "Head"])
    mid_f1 = avg([f for name, _, _, _, f in type_metrics if bucket[name] == "Mid"])
    tail_f1 = avg([f for name, _, _, _, f in type_metrics if bucket[name] == "Tail"])
    f1s = [f for _, _, _, _, f in type_metrics]
    mean = sum(f1s) / n
    gini = (
        0.0
        if mean < 1e-10
        else sum(abs(a - b) for a in f1s for b in f1s) / (2.0 * n * n * mean)
    )
    return {
        "bucket": bucket,
        "head_f1": head_f1,
        "mid_f1": mid_f1,
        "tail_f1": tail_f1,
        "head_tail_gap": head_f1 - tail_f1,
        "gini": gini,
        "struggling": sum(1 for f in f1s if f < 0.5),
        "failed": sum(1 for f in f1s if f < 0.01),
    }


def test_differential_vs_transcription(spark):
    rows = [
        ("PER", 120, 0.95, 0.9, 0.92),
        ("ORG", 100, 0.85, 0.8, 0.82),
        ("LOC", 75, 0.7, 0.6, 0.65),
        ("DATE", 75, 0.6, 0.5, 0.55),
        ("MONEY", 30, 0.5, 0.4, 0.44),
        ("GPE", 12, 0.3, 0.2, 0.24),
        ("GENE", 4, 0.0, 0.0, 0.0),
        ("DISEASE", 2, 0.1, 0.05, 0.066),
    ]
    for pct in (0.05, 0.2, 0.33, 0.4):
        want = _rust_analyze(rows, pct)
        per, summary = long_tail_report(_per_type_df(spark, rows), pct)
        got_bucket = {r.entity_type: r.bucket for r in per.collect()}
        assert got_bucket == want["bucket"], pct
        s = summary.collect()[0]
        assert s.head_f1 == pytest.approx(want["head_f1"]), pct
        assert s.mid_f1 == pytest.approx(want["mid_f1"]), pct
        assert s.tail_f1 == pytest.approx(want["tail_f1"]), pct
        assert s.head_tail_gap == pytest.approx(want["head_tail_gap"]), pct
        assert s.gini_coefficient == pytest.approx(want["gini"]), pct
        assert s.struggling_types == want["struggling"], pct
        assert s.failed_types == want["failed"], pct


# ------------------------------------------------- insights & formatting


def test_insights_and_format(spark):
    rows = [
        ("PER", 500, 0.9, 0.9, 0.9),
        ("ORG", 400, 0.8, 0.8, 0.8),
        ("LOC", 80, 0.7, 0.7, 0.7),
        ("GENE", 15, 0.0, 0.0, 0.0),
        ("DISEASE", 5, 0.1, 0.1, 0.1),
    ]
    per, summary = long_tail_report(_per_type_df(spark, rows), 0.2)
    s = summary.collect()[0]
    tail = [
        r.entity_type
        for r in per.where("bucket = 'Tail'")
        .orderBy(per["count"].desc(), "entity_type")
        .collect()
    ]
    lines = insights(s, tail)
    assert any(line.startswith("Large head-tail gap (") for line in lines)
    assert "1 entity types completely failed (F1=0%)" in lines
    assert any(line.startswith("Tail types struggling:") for line in lines)
    # tail coverage = 5/1000 = 0.5% < 10%
    assert any("may need upsampling" in line for line in lines)
    text = format_long_tail_results(s, lines)
    assert text.startswith("Long-Tail Analysis:\n  Head F1: 90.0%")
    assert "Insights:" in text


# ------------------------------------------------------------ end-to-end


def test_per_type_prf_feeds_long_tail(spark):
    """ner_prf_by_type_df → long_tail_report over planted mentions:
    PER perfect, ORG half-recalled, RARE entirely missed."""
    from anno_spark.eval.ner_eval import ner_prf_by_type_df

    gold_rows = (
        [("u%d" % i, i * 10, i * 10 + 5, "PER") for i in range(10)]
        + [("u%d" % i, 300 + i, 305 + i, "ORG") for i in range(4)]
        + [("u0", 900, 905, "RARE")]
    )
    pred_rows = (
        [("u%d" % i, i * 10, i * 10 + 5, "PER") for i in range(10)]
        + [("u%d" % i, 300 + i, 305 + i, "ORG") for i in range(2)]
        # RARE never predicted; one spurious type
        + [("u1", 50, 55, "FAKE")]
    )
    sch = "url string, start int, end int, entity_type string"
    per_type = ner_prf_by_type_df(
        spark.createDataFrame(pred_rows, sch), spark.createDataFrame(gold_rows, sch)
    )
    rows = {r.entity_type: r for r in per_type.collect()}
    assert rows["PER"].f1 == pytest.approx(1.0)
    assert rows["ORG"].recall == pytest.approx(0.5)
    assert rows["RARE"].f1 == 0.0
    assert rows["FAKE"]["count"] == 0  # gold count drives frequency

    per, summary = long_tail_report(per_type, 0.2)
    s = summary.collect()[0]
    assert s.n_types == 4
    bucket = {r.entity_type: r.bucket for r in per.collect()}
    assert bucket["PER"] == "Head"
    # FAKE(0) ties below RARE(1): tail = FAKE by rank order
    assert bucket["FAKE"] == "Tail"
    assert s.failed_types == 2  # RARE and FAKE

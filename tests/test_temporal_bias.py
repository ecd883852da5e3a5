"""Temporal-bias NER eval (reference: anno/src/eval/temporal_bias.rs).

Layers: transcribed reference unit tests (temporal_bias.rs:600-674); a
pure-python transcription of TemporalBiasEvaluator::evaluate's
aggregation as a differential oracle over planted recognition flags;
hand-computed gap cases; the duplicate-full-name quirk; end-to-end
over the REAL extraction stack with the recognition rate pinned as a
regression floor.
"""

from __future__ import annotations

import random

import pytest

from anno_spark.eval.temporal_bias import (
    DECADE_ORDER,
    DECADES,
    create_temporal_name_dataset,
    evaluate_temporal_bias,
    group_rates,
    is_historical,
    is_modern,
    midpoint_year,
    names_df,
    temporal_bias_report,
    temporal_sentence,
)

REC_SCHEMA = (
    "url string, first_name string, full_name string, peak_decade string,"
    " gender string, is_classic boolean, recognized int"
)


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _report(spark, rows):
    df = spark.createDataFrame(rows, REC_SCHEMA)
    out = temporal_bias_report(df).collect()
    assert len(out) == 1
    return out[0]


def _rec_row(i, decade, gender="Feminine", classic=False, recognized=1):
    return (f"u{i}", f"f{i}", f"f{i} l{i}", decade, gender, classic, recognized)


# ------------------------------------------------------------ transcribed


def test_create_temporal_dataset():
    # temporal_bias.rs:604-620
    names = create_temporal_name_dataset()
    decades = {n[3] for n in names}
    assert len(decades) >= 10
    assert "Pre1900" in decades
    assert "D2020s" in decades


def test_historical_vs_modern():
    # temporal_bias.rs:622-634
    names = create_temporal_name_dataset()
    assert sum(1 for n in names if is_historical(n[3])) > 0
    assert sum(1 for n in names if is_modern(n[3])) > 0


def test_classic_names_marked():
    # temporal_bias.rs:636-651
    classics = [n for n in create_temporal_name_dataset() if n[5]]
    assert classics
    assert any(n[0] == "James" for n in classics)
    assert any(n[0] == "Elizabeth" for n in classics)


def test_decade_ordering():
    # temporal_bias.rs:653-658 — Ord follows declaration order
    idx = DECADE_ORDER.index
    assert idx("Pre1900") < idx("D1900s")
    assert idx("D1900s") < idx("D2020s")
    assert midpoint_year("D1980s") == 1985


def test_gender_distribution():
    # temporal_bias.rs:660-673
    names = create_temporal_name_dataset()
    assert sum(1 for n in names if n[4] == "Masculine") > 20
    assert sum(1 for n in names if n[4] == "Feminine") > 20


# ------------------------------------------------------------ dataset quirks


def test_dataset_shape_and_duplicates():
    names = create_temporal_name_dataset()
    assert len(names) == 95
    from collections import Counter

    dupes = {k for k, v in Counter(n[2] for n in names).items() if v > 1}
    # temporal_bias.rs:444,515-534,551 — cycled last names collide
    assert dupes == {"Liam Johnson", "Robert Johnson"}
    # classics carry the nominal D1950s peak (temporal_bias.rs:583-594)
    assert all(n[3] == "D1950s" for n in names if n[5])


def test_sentence_templates_deterministic():
    s = temporal_sentence("Ethel Smith")
    assert s == temporal_sentence("Ethel Smith")
    assert "Ethel Smith" in s


# ------------------------------------------------------------ hand-computed


def test_empty_modern_rate_zero(spark):
    # count_to_rate on an empty group is 0.0, not NULL
    # (temporal_bias.rs:296-302); gap then compares against 0.0.
    rows = [_rec_row(0, "Pre1900", recognized=1), _rec_row(1, "D1920s", recognized=0)]
    m = _report(spark, rows)
    assert m.modern_rate == 0.0
    assert m.historical_rate == pytest.approx(0.5)
    assert m.historical_modern_gap == pytest.approx(0.5)
    assert m.temporal_parity_gap == pytest.approx(1.0)  # 1.0 vs 0.0
    assert m.total_tested == 2


def test_single_decade_parity_gap_zero(spark):
    # compute_max_gap with <2 decades is 0.0 (temporal_bias.rs:333-344)
    rows = [_rec_row(0, "D1960s", recognized=1), _rec_row(1, "D1960s", recognized=0)]
    m = _report(spark, rows)
    assert m.temporal_parity_gap == 0.0
    assert m.overall_recognition_rate == pytest.approx(0.5)


def test_classic_excluded_from_historical_modern(spark):
    # classics sit at D1950s: neither historical nor modern
    rows = [
        _rec_row(0, "D1950s", classic=True, recognized=1),
        _rec_row(1, "Pre1900", recognized=0),
        _rec_row(2, "D2010s", recognized=1),
    ]
    m = _report(spark, rows)
    assert m.historical_rate == 0.0
    assert m.modern_rate == 1.0
    assert m.classic_rate == 1.0
    assert m.trendy_rate == pytest.approx(0.5)


# ------------------------------------------------------------ differential


def _ref_aggregate(rows):
    """Pure-python transcription of the aggregation inside
    TemporalBiasEvaluator::evaluate (temporal_bias.rs:215-330), taking
    (decade, gender, is_classic, recognized) in place of the model
    call."""
    by_decade: dict[str, list[int]] = {}
    by_gender: dict[str, list[int]] = {}
    hist = [0, 0]
    mod = [0, 0]
    cls = [0, 0]
    trend = [0, 0]
    total_recognized = 0
    for decade, gender, is_cls, rec in rows:
        if rec:
            total_recognized += 1
        d = by_decade.setdefault(decade, [0, 0])
        d[1] += 1
        d[0] += rec
        if is_historical(decade):
            hist[1] += 1
            hist[0] += rec
        if is_modern(decade):
            mod[1] += 1
            mod[0] += rec
        g = by_gender.setdefault(gender, [0, 0])
        g[1] += 1
        g[0] += rec
        t = cls if is_cls else trend
        t[1] += 1
        t[0] += rec

    rate = lambda c: c[0] / c[1] if c[1] else 0.0
    decade_rates = {k: rate(v) for k, v in by_decade.items()}
    gap = (
        max(decade_rates.values()) - min(decade_rates.values())
        if len(decade_rates) >= 2
        else 0.0
    )
    return dict(
        overall=total_recognized / len(rows) if rows else 0.0,
        by_decade=decade_rates,
        by_gender={k: rate(v) for k, v in by_gender.items()},
        historical=rate(hist),
        modern=rate(mod),
        hm_gap=abs(rate(hist) - rate(mod)),
        parity=gap,
        classic=rate(cls),
        trendy=rate(trend),
        total=len(rows),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random_flags(spark, seed):
    rng = random.Random(seed)
    decades = list(DECADES)
    rows = [
        _rec_row(
            i,
            rng.choice(decades),
            rng.choice(["Masculine", "Feminine", "Neutral"]),
            rng.random() < 0.2,
            int(rng.random() < 0.7),
        )
        for i in range(60)
    ]
    expect = _ref_aggregate([(r[3], r[4], r[5], r[6]) for r in rows])

    m = _report(spark, rows)
    assert m.overall_recognition_rate == pytest.approx(expect["overall"])
    assert m.historical_rate == pytest.approx(expect["historical"])
    assert m.modern_rate == pytest.approx(expect["modern"])
    assert m.historical_modern_gap == pytest.approx(expect["hm_gap"])
    assert m.temporal_parity_gap == pytest.approx(expect["parity"])
    assert m.classic_rate == pytest.approx(expect["classic"])
    assert m.trendy_rate == pytest.approx(expect["trendy"])
    assert m.total_tested == expect["total"]

    rates = {
        (r.dimension, r.bucket): (r.rate, r.n)
        for r in group_rates(spark.createDataFrame(rows, REC_SCHEMA)).collect()
    }
    for k, v in expect["by_decade"].items():
        assert rates[("decade", k)][0] == pytest.approx(v)
    for k, v in expect["by_gender"].items():
        assert rates[("gender", k)][0] == pytest.approx(v)


# ------------------------------------------------------------ end-to-end


def test_real_extractor_unbiased_floor(spark):
    # The engine's capitalized-bigram heuristic recognizes every
    # "First Last" in every template: a 1.0 rate with zero gaps across
    # all decades — pinned as a regression floor (the test_regression_f1
    # posture: a recognizer change that drops ANY decade must surface).
    m = evaluate_temporal_bias(spark).collect()[0]
    assert m.total_tested == 95
    assert m.overall_recognition_rate == 1.0
    assert m.historical_rate == 1.0
    assert m.modern_rate == 1.0
    assert m.historical_modern_gap == 0.0
    assert m.temporal_parity_gap == 0.0
    assert m.classic_rate == 1.0
    assert m.trendy_rate == 1.0

    rates = group_rates(
        __import__("anno_spark.eval.temporal_bias", fromlist=["x"])
        .recognition_table(
            names_df(spark),
            _real_mentions(spark),
        )
    ).collect()
    decade_rows = [r for r in rates if r.dimension == "decade"]
    assert len(decade_rows) == 14
    assert all(r.rate == 1.0 for r in decade_rows)


def _real_mentions(spark):
    from pyspark.sql import functions as F

    from anno_spark.operators.extract import extract_documents, mentions_table

    ex = names_df(spark)
    return mentions_table(
        extract_documents(ex.select("url", F.col("sentence").alias("text")))
    )

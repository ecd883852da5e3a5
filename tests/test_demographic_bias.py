"""Demographic-bias eval tests (anno_spark/eval/demographic_bias.py vs
anno/src/eval/demographic_bias.rs + bias_config.rs).

Recognition semantics are pinned with a CONTROLLED mentions table (so
assertions are exact); the end-to-end path through the real extraction
stack is sanity-gated separately.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import anno_spark.eval.demographic_bias as db


class TestPureFunctions:
    def test_statistical_from_values(self):
        # bias_config.rs test_statistical_results
        r = db.statistical_from_values([0.8, 0.82, 0.79, 0.81, 0.83], 0.95)
        assert abs(r["mean"] - 0.81) < 0.01
        assert r["n"] == 5
        assert r["ci_95"][0] < r["mean"] < r["ci_95"][1]
        assert r["min"] == 0.79 and r["max"] == 0.83

    def test_statistical_empty_and_single(self):
        assert db.statistical_from_values([])["n"] == 0
        r = db.statistical_from_values([0.5])
        assert r["std_dev"] == 0.0 and r["ci_95"] == (0.5, 0.5)

    def test_effect_size(self):
        # bias_config.rs test_effect_size
        d = db.cohens_d([0.9, 0.91, 0.89, 0.92, 0.88],
                        [0.7, 0.71, 0.69, 0.72, 0.68])
        assert 0.0 < d < 100.0
        assert db.cohens_d([], [0.5]) == 0.0
        assert db.cohens_d([0.5, 0.5], [0.5, 0.5]) == 0.0  # zero pooled std

    def test_frequency_weighted(self):
        # bias_config.rs test_frequency_weighted
        r = db.frequency_weighted_results(
            [True, False, True, True, False],
            {"Name1": 0.5, "Name2": 0.3, "Name3": 0.2},
            ["Name1", "Name2", "Name3", "Name1", "Name2"])
        assert r["unweighted_rate"] == 0.6
        # weighted: (0.5 + 0.2 + 0.5) / (0.5+0.3+0.2+0.5+0.3)
        assert abs(r["weighted_rate"] - 1.2 / 1.8) < 1e-12

    def test_distribution_validation(self):
        # bias_config.rs test_distribution_validation
        v = db.validate_distribution({"A": 0.5, "B": 0.5},
                                     {"A": 0.48, "B": 0.52}, 0.1)
        assert v["is_valid"] and v["max_deviation"] < 0.1
        # observed-only category counts fully as deviation
        v = db.validate_distribution({"A": 0.5, "X": 0.5}, {"A": 0.5}, 0.1)
        assert not v["is_valid"] and v["max_deviation"] == 0.5

    def test_census_validation_normalizes(self):
        # rates normalized to proportions before comparison
        # (demographic_bias.rs:2514-2523)
        v = db.validate_demographic_distribution(
            {k: r * 10 for k, r in db.CENSUS_REFERENCE.items()})
        assert v["is_valid"]

    def test_compute_max_gap(self):
        assert db.compute_max_gap({"a": 0.9}) == 0.0
        assert db.compute_max_gap({"a": 0.9, "b": 0.6, "c": 0.7}) == pytest.approx(0.3)

    def test_template_selection_deterministic(self):
        s1 = db.realistic_sentence("James Smith")
        assert s1 == db.realistic_sentence("James Smith")
        assert "James Smith" in s1
        assert any(s1 == t.format("James Smith") for t in db.NAME_TEMPLATES)
        loc = db.realistic_location_sentence("Paris")
        assert any(loc == t.format("Paris") for t in db.LOCATION_TEMPLATES)


class TestDatasets:
    def test_sizes(self):
        assert len(db.DIVERSE_NAMES) == 210   # :706-2571
        assert len(db.DIVERSE_LOCATIONS) == 42  # :2572-2914
        assert len(db.NAME_TEMPLATES) == 20
        assert len(db.LOCATION_TEMPLATES) == 10

    def test_ethnicity_distribution(self):
        from collections import Counter
        c = Counter(n[2] for n in db.DIVERSE_NAMES)
        assert c == {"European": 38, "EastAsian": 32, "AfricanAmerican": 28,
                     "Hispanic": 28, "SouthAsian": 28, "MiddleEastern": 28,
                     "African": 28}

    def test_name_fields(self):
        for first, last, eth, script, gender, freq in db.DIVERSE_NAMES:
            assert first and last
            assert gender in (None, "Masculine", "Feminine", "Neutral")
            assert freq in ("Common", "Moderate", "Rare")

    def test_location_regions(self):
        regions = {r for _, r, _, _ in db.DIVERSE_LOCATIONS}
        assert len(regions) == 10  # all Region variants exercised


@pytest.fixture(scope="module")
def controlled(spark):
    """4 names + a hand-built mentions table: exact recognition truth."""
    names = spark.createDataFrame(
        [
            ("u1", "Ana Reyes", "Ana", "Reyes", "Hispanic", "Latin",
             "Feminine", "Common", "Ana Reyes spoke."),
            ("u2", "Wei Chen", "Wei", "Chen", "EastAsian", "Latin",
             "Masculine", "Common", "Wei Chen spoke."),
            ("u3", "Omar Hassan", "Omar", "Hassan", "MiddleEastern", "Latin",
             "Masculine", "Rare", "Omar Hassan spoke."),
            ("u4", "Kim Lee", "Kim", "Lee", "EastAsian", "Latin",
             None, "Common", "Kim Lee spoke."),
        ],
        list(db.NAME_COLUMNS),
    )
    mentions = spark.createDataFrame(
        [
            # u1: ORG first (earlier span), matching PER second → recognized,
            # confidence from FIRST PER by span (0.8 — the matching one)
            ("u1", "PER", "Ana Reyes", 0, 0.8),
            ("u1", "ORG", "Reyes Corp", 20, 0.9),
            # u2: PER mention NOT containing first name → not recognized
            ("u2", "PER", "Chen", 4, 0.7),
            # u3: two PER mentions; first by span (0.3) is NOT the match →
            # quirk: confidence still comes from the first
            ("u3", "PER", "Hassan", 2, 0.3),
            ("u3", "PER", "Omar Hassan", 10, 0.9),
            # u4: no mentions at all
        ],
        ["url", "entity_type", "text", "start", "confidence"],
    )
    rec = db._recognition(names, mentions, "PER", "first_name")
    return {r["url"]: r for r in rec.collect()}, rec


class TestRecognitionSemantics:
    def test_containment_rule(self, controlled):
        rows, _ = controlled
        assert rows["u1"].recognized is True
        assert rows["u2"].recognized is False  # "Chen" lacks first name
        assert rows["u3"].recognized is True
        assert rows["u4"].recognized is False  # no mentions (left join)

    def test_first_person_confidence_quirk(self, controlled):
        rows, _ = controlled
        assert rows["u1"].confidence == pytest.approx(0.8)
        # u3's matching mention has 0.9 but the FIRST PER by span has 0.3
        assert rows["u3"].confidence == pytest.approx(0.3)
        # unrecognized → confidence NULL (:368-376)
        assert rows["u2"].confidence is None
        assert rows["u4"].confidence is None

    def test_rates_and_gaps(self, controlled):
        _, rec = controlled
        rates = {(r.dimension, r.key): (r.rate, r.n)
                 for r in db.bias_rates(rec).collect()}
        assert rates[("ethnicity", "Hispanic")] == (1.0, 1)
        assert rates[("ethnicity", "EastAsian")] == (0.0, 2)  # u2+u4 missed
        assert rates[("frequency", "Rare")] == (1.0, 1)
        # gender=None (u4) excluded from gender + intersectional rollups
        assert ("gender", None) not in rates
        assert rates[("gender", "Masculine")][1] == 2
        assert rates[("intersectional", "EastAsian_Masculine")] == (0.0, 1)
        assert rates[("extended_intersectional",
                      "MiddleEastern_Masculine_Rare")] == (1.0, 1)
        summary = db.bias_summary(rec).collect()[0]
        assert summary.overall_recognition_rate == pytest.approx(0.5)
        assert summary.total_tested == 4
        # ethnicity gap: max 1.0 (Hispanic/MiddleEastern) − min 0.0 (EastAsian)
        assert summary.ethnicity_parity_gap == pytest.approx(1.0)
        # only Latin script present → gap 0 (fallback, :487-492)
        assert summary.script_bias_gap == pytest.approx(0.0)


class TestEndToEnd:
    def test_name_recognition_through_engine(self, spark):
        rec = db.name_recognition(spark)
        rec = rec.cache()
        assert rec.count() == 210
        summary = db.bias_summary(rec).collect()[0]
        assert 0.0 < summary.overall_recognition_rate <= 1.0
        assert summary.total_tested == 210
        rates = db.bias_rates(rec)
        dims = {r.dimension for r in rates.select("dimension").distinct().collect()}
        assert dims == {"ethnicity", "script", "gender", "frequency",
                        "intersectional", "extended_intersectional"}
        # deterministic: a second run produces identical recognition
        rec2 = db.name_recognition(spark)
        diff = rec.select("url", "recognized").exceptAll(
            rec2.select("url", "recognized"))
        assert diff.count() == 0

    def test_location_recognition_through_engine(self, spark):
        rec = db.location_recognition(spark).cache()
        assert rec.count() == 42
        summary = db.regional_summary(rec).collect()[0]
        assert summary.total_tested == 42
        assert 0.0 <= summary.regional_parity_gap <= 1.0
        by = db.regional_rates(rec)
        assert by.where(F.col("dimension") == "region").count() == 10

"""Active-learning selection tests (anno_spark/eval/active_learning.py
vs anno/src/eval/active_learning.rs:49-712). Reference test cases
transcribed from active_learning.rs:596-712; the Spark scorers are
pinned against the pure port value-for-value."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import anno_spark.eval.active_learning as al


def _c(text, conf, committee=None, embedding=None):
    return {"text": text, "confidence": conf, "committee": committee,
            "embedding": embedding}


class TestPurePort:
    def test_uncertainty_sampling(self):
        cands = [_c("High confidence", 0.95), _c("Low confidence", 0.30),
                 _c("Medium confidence", 0.60)]
        idx = al.select(cands, 2, "uncertainty")
        assert [cands[i]["text"] for i in idx] == ["Low confidence",
                                                   "Medium confidence"]

    def test_committee_sampling(self):
        cands = [
            _c("Disagreement", 0.5, [["PER"], ["ORG"], ["LOC"]]),
            _c("Agreement", 0.5, [["PER"], ["PER"], ["PER"]]),
        ]
        idx = al.select(cands, 1, "committee")
        assert cands[idx[0]]["text"] == "Disagreement"

    def test_committee_disagreement_values(self):
        # full agreement → p=1 per type → 0
        assert al.committee_disagreement([["PER"], ["PER"]], 0.5) == 0.0
        # 3 models, 3 disjoint types: each p=1/3 → 4*(1/3)*(2/3)=8/9
        d = al.committee_disagreement([["PER"], ["ORG"], ["LOC"]], 0.5)
        assert d == pytest.approx(8 / 9)
        # <2 models → 1−confidence
        assert al.committee_disagreement([["PER"]], 0.4) == pytest.approx(0.6)
        # no types anywhere → 0.0
        assert al.committee_disagreement([[], []], 0.4) == 0.0

    def test_diversity_sampling_with_embeddings(self):
        cands = [
            _c("Near origin", 0.5, embedding=[0.0, 0.0]),
            _c("Far positive", 0.5, embedding=[10.0, 10.0]),
            _c("Far negative", 0.5, embedding=[-10.0, -10.0]),
            _c("Near origin 2", 0.5, embedding=[0.1, 0.1]),
        ]
        idx = al.select(cands, 3, "diversity")
        texts = {cands[i]["text"] for i in idx}
        assert len(idx) == 3
        assert "Far positive" in texts and "Far negative" in texts

    def test_diversity_fallback_without_embeddings(self):
        cands = [_c("No embedding 1", 0.9), _c("No embedding 2", 0.3)]
        r = al.select_with_scores(cands, 1, "diversity")
        assert r["actual_strategy"] == "uncertainty"
        assert r["warnings"]
        assert r["selected"][0][0] == "No embedding 2"

    def test_committee_fallback_without_predictions(self):
        cands = [_c("No committee 1", 0.9), _c("No committee 2", 0.3)]
        r = al.select_with_scores(cands, 1, "committee")
        assert r["actual_strategy"] == "uncertainty"
        assert r["warnings"]

    def test_hybrid_no_committee_still_hybrid(self):
        # :268-277 — warns but does NOT switch strategy
        cands = [_c("a", 0.9), _c("b", 0.3)]
        r = al.select_with_scores(cands, 1, "hybrid")
        assert r["actual_strategy"] == "hybrid"
        assert r["warnings"]
        # committee term degenerates to 1−conf, so score = 1−conf
        assert r["selected"][0] == ("b", pytest.approx(0.7))

    def test_select_with_scores(self):
        cands = [_c("A", 0.90), _c("B", 0.40), _c("C", 0.70)]
        r = al.select_with_scores(cands, 2, "uncertainty")
        assert len(r["selected"]) == 2
        assert r["total_candidates"] == 3
        assert r["score_stats"]["mean_selected"] > r["score_stats"]["mean_all"]
        assert r["score_stats"]["max_score"] == pytest.approx(0.6)
        assert r["score_stats"]["min_score"] == pytest.approx(0.1)
        assert not r["warnings"]

    def test_random_deterministic(self):
        cands = [_c(f"t{i}", 0.5) for i in range(10)]
        a = al.select(cands, 3, "random", seed=42)
        b = al.select(cands, 3, "random", seed=42)
        assert a == b
        assert al.random_score("abc", 0, 42) == al.random_score("abc", 0, 42)
        assert 0.0 <= al.random_score("abc", 0, 42) < 1.0

    def test_estimate_budget(self):
        # 0.15/0.01 in f64 is 15.000000000000002 → ceil lands on 1501,
        # identical to the reference's f64 .ceil()
        assert al.estimate_budget(0.70, 0.85, 1000, 0.01) == 1501
        assert al.estimate_budget(0.90, 0.85, 1000, 0.01) == 0  # met
        assert al.estimate_budget(0.70, 0.85, 1000, 0.0) == 0   # no slope

    def test_empty_candidates(self):
        assert al.select([], 5) == []

    def test_diversity_scores_normalized_with_fallback(self):
        cands = [
            _c("a", 0.2, embedding=[0.0]),
            _c("b", 0.5, embedding=[10.0]),
            _c("c", 0.9),  # no embedding → raw 0.1 before normalization
        ]
        s = al.diversity_scores(cands)
        assert max(s) == 1.0 and min(s) == 0.0
        assert len(s) == 3


class TestSparkPath:
    @pytest.fixture(scope="class")
    def pool(self, spark):
        rows = [
            (0, "alpha", 0.95, [["PER"], ["PER"]]),
            (1, "beta", 0.30, [["PER"], ["ORG"], ["LOC"]]),
            (2, "gamma", 0.60, [["ORG"], ["ORG"]]),
            (3, "delta", 0.50, None),
        ]
        return spark.createDataFrame(
            rows, "idx long, text string, confidence double, "
                  "committee array<array<string>>")

    def test_uncertainty_topk_matches_pure(self, pool):
        got = [r.text for r in al.select_topk(pool, 2, "uncertainty")
               .select("text").collect()]
        assert got == ["beta", "delta"]

    def test_committee_scores_match_pure(self, pool):
        rows = al.score_candidates(pool, "committee").orderBy("idx").collect()
        for r in rows:
            committee = ([list(p) for p in r.committee]
                         if r.committee is not None else [])
            assert r.score == pytest.approx(
                al.committee_disagreement(committee, r.confidence))

    def test_hybrid_scores_match_pure(self, pool):
        rows = al.score_candidates(pool, "hybrid").orderBy("idx").collect()
        for r in rows:
            committee = ([list(p) for p in r.committee]
                         if r.committee is not None else [])
            expect = (0.7 * (1.0 - r.confidence)
                      + 0.3 * al.committee_disagreement(committee,
                                                        r.confidence))
            assert r.score == pytest.approx(expect)

    def test_random_scores_match_pure(self, pool):
        rows = al.score_candidates(pool, "random", seed=7).orderBy("idx").collect()
        for r in rows:
            assert r.score == pytest.approx(al.random_score(r.text, r.idx, 7))

    def test_committee_plan_is_jvm_only(self, pool):
        plan = al.score_candidates(pool, "committee")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_select_diverse(self, spark):
        df = spark.createDataFrame(
            [(0, "near", 0.5, [0.0, 0.0]), (1, "farp", 0.5, [10.0, 10.0]),
             (2, "farn", 0.5, [-10.0, -10.0]), (3, "near2", 0.5, [0.1, 0.1])],
            "idx long, text string, confidence double, "
            "embedding array<double>")
        got = {r.text for r in al.select_diverse(df, 3).collect()}
        assert "farp" in got and "farn" in got and len(got) == 3

    def test_select_diverse_gate(self, spark):
        df = spark.range(30).select(
            F.col("id").alias("idx"),
            F.lit("t").alias("text"),
            F.lit(0.5).alias("confidence"),
            F.array(F.col("id").cast("double")).alias("embedding"))
        with pytest.raises(ValueError, match="gated"):
            al.select_diverse(df, 2, max_rows=10)

"""E1/E3 eval metric tests."""

from __future__ import annotations

import pytest


class TestBCubed:
    def test_perfect(self, spark):
        from anno_spark.eval.cluster_eval import b_cubed

        a = spark.createDataFrame(
            [(1, "c1"), (2, "c1"), (3, "c2")], "mention_id bigint, cluster_id string"
        )
        m = b_cubed(a, a)
        assert m.precision == m.recall == m.f1 == 1.0

    def test_oversplit_recall_drops(self, spark):
        from anno_spark.eval.cluster_eval import b_cubed

        gold = spark.createDataFrame(
            [(1, "g"), (2, "g"), (3, "g"), (4, "g")], "mention_id bigint, cluster_id string"
        )
        pred = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "mention_id bigint, cluster_id string"
        )
        m = b_cubed(pred, gold)
        assert m.precision == 1.0
        assert m.recall == pytest.approx(0.5)

    def test_overmerge_precision_drops(self, spark):
        from anno_spark.eval.cluster_eval import b_cubed

        gold = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "mention_id bigint, cluster_id string"
        )
        pred = spark.createDataFrame(
            [(1, "g"), (2, "g"), (3, "g"), (4, "g")], "mention_id bigint, cluster_id string"
        )
        m = b_cubed(pred, gold)
        assert m.recall == 1.0
        assert m.precision == pytest.approx(0.5)

    def test_missing_mention_counts_in_denominator(self, spark):
        from anno_spark.eval.cluster_eval import b_cubed

        gold = spark.createDataFrame(
            [(1, "g"), (2, "g")], "mention_id bigint, cluster_id string"
        )
        pred = spark.createDataFrame(
            [(1, "p")], "mention_id bigint, cluster_id string"
        )
        m = b_cubed(pred, gold)
        assert m.n_mentions == 2
        assert m.precision == pytest.approx(0.5)  # mention 2 contributes 0


DDL = "url string, start int, end int, entity_type string"


class TestNerEval:
    def test_exact(self, spark):
        from anno_spark.eval.ner_eval import ner_prf_exact

        g = spark.createDataFrame([("u", 0, 5, "PER"), ("u", 10, 15, "ORG")], DDL)
        p = spark.createDataFrame([("u", 0, 5, "PER"), ("u", 10, 16, "ORG")], DDL)
        m = ner_prf_exact(p, g)
        assert m.n_matched == 1 and m.precision == 0.5 and m.recall == 0.5

    def test_partial_overlap_counts(self, spark):
        from anno_spark.eval.ner_eval import ner_prf_partial

        g = spark.createDataFrame([("u", 0, 5, "PER"), ("u", 10, 15, "ORG")], DDL)
        p = spark.createDataFrame([("u", 1, 4, "PER"), ("u", 10, 16, "ORG")], DDL)
        m = ner_prf_partial(p, g)
        assert m.n_matched == 2 and m.f1 == 1.0

    def test_partial_type_gate(self, spark):
        from anno_spark.eval.ner_eval import ner_prf_partial

        g = spark.createDataFrame([("u", 0, 5, "PER")], DDL)
        p = spark.createDataFrame([("u", 0, 5, "ORG")], DDL)
        assert ner_prf_partial(p, g).n_matched == 0

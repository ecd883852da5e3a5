"""Discontinuous-NER eval tests (anno_spark/eval/discontinuous.py vs
anno/src/eval/discontinuous.rs:38-580). Reference test cases
transcribed from discontinuous.rs:472-580, plus Spark-path parity: the
cogrouped distributed evaluation must reproduce the pure single-corpus
port exactly."""

from __future__ import annotations

import pytest

import anno_spark.eval.discontinuous as disc


def _g(spans, etype):
    return {"spans": spans, "entity_type": etype}


class TestPurePort:
    def test_exact_match(self):
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 5), (10, 15)], "LOC")], [_g([(0, 5), (10, 15)], "LOC")])
        assert m["exact_f1"] == pytest.approx(1.0)
        assert m["exact_matches"] == 1

    def test_exact_match_order_insensitive(self):
        m = disc.evaluate_discontinuous_ner(
            [_g([(10, 15), (0, 5)], "LOC")], [_g([(0, 5), (10, 15)], "LOC")])
        assert m["exact_f1"] == pytest.approx(1.0)

    def test_boundary_match(self):
        # same bounding range, different internal structure
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 5), (10, 15)], "LOC")],
            [_g([(0, 3), (3, 5), (10, 15)], "LOC")])
        assert m["exact_f1"] < 1.0
        assert m["entity_boundary_f1"] == pytest.approx(1.0)

    def test_contiguous_helpers(self):
        assert disc.is_contiguous([(0, 10)])
        assert not disc.is_contiguous([(0, 5), (10, 15)])
        assert disc.total_length([(0, 10)]) == 10
        assert disc.bounding_range([(0, 5), (20, 30)]) == (0, 30)
        assert disc.bounding_range([]) is None

    def test_empty_inputs_all_ones(self):
        m = disc.evaluate_discontinuous_ner([], [])
        assert m["exact_f1"] == 1.0 and m["partial_span_f1"] == 1.0
        assert m["num_gold"] == 0 and m["per_type"] == {}

    def test_one_sided_empty_is_zero(self):
        m = disc.evaluate_discontinuous_ner([_g([(0, 5)], "PER")], [])
        assert m["exact_f1"] == 0.0 and m["exact_recall"] == 0.0
        assert m["partial_span_f1"] == 0.0

    def test_type_mismatch(self):
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 5)], "PER")], [_g([(0, 5)], "ORG")])
        assert m["exact_f1"] < 0.001
        # without type requirement it matches
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 5)], "PER")], [_g([(0, 5)], "ORG")],
            require_type_match=False)
        assert m["exact_f1"] == pytest.approx(1.0)

    def test_partial_overlap(self):
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 10)], "LOC")], [_g([(5, 15)], "LOC")])
        assert 0.0 < m["partial_span_f1"] < 1.0
        # IoU = 5 / 15
        assert m["partial_span_precision"] == pytest.approx(5 / 15)

    def test_multi_span_overlap(self):
        # a: 0-10 ∪ 20-30 (20 chars); b: 5-25 (20 chars);
        # intersection 10 chars (5-10, 20-25); union 30 chars
        ov = disc.multi_span_overlap([(0, 10), (20, 30)], [(5, 25)])
        assert ov == pytest.approx(10 / 30)
        assert disc.multi_span_overlap([], []) == 1.0

    def test_greedy_one_to_one(self):
        # two identical preds, one gold → only one exact match
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 5)], "PER")],
            [_g([(0, 5)], "PER"), _g([(0, 5)], "PER")])
        assert m["exact_matches"] == 1
        assert m["exact_precision"] == pytest.approx(0.5)
        assert m["exact_recall"] == pytest.approx(1.0)

    def test_per_type_breakdown(self):
        m = disc.evaluate_discontinuous_ner(
            [_g([(0, 5)], "PER"), _g([(10, 15)], "LOC")],
            [_g([(0, 5)], "PER"), _g([(30, 40)], "ORG")])
        assert m["per_type"]["PER"]["exact_f1"] == pytest.approx(1.0)
        assert m["per_type"]["LOC"] == {"exact_f1": 0.0, "boundary_f1": 0.0,
                                        "gold_count": 1, "pred_count": 0,
                                        "exact_matches": 0}
        assert m["per_type"]["ORG"]["pred_count"] == 1  # pred-only type row


@pytest.fixture(scope="module")
def corpus(spark):
    gold = spark.createDataFrame(
        [
            ("d1", "ADR", [[0, 11], [15, 19]]),
            ("d1", "drug", [[25, 34]]),
            ("d2", "ADR", [[0, 5]]),
            ("d3", "ADR", [[2, 8]]),
        ],
        "url string, entity_type string, spans array<array<long>>")
    pred = spark.createDataFrame(
        [
            ("d1", "ADR", [[0, 11], [15, 19]]),   # exact
            ("d1", "drug", [[25, 30]]),            # partial only
            ("d2", "ADR", [[0, 3], [3, 5]]),       # boundary only
            ("d3", "drug", [[2, 8]]),              # wrong type
            ("d4", "ADR", [[0, 4]]),               # pred-only doc
        ],
        "url string, entity_type string, spans array<array<long>>")
    return gold, pred


class TestSparkPath:
    def test_matches_pure_port(self, spark, corpus):
        gold, pred = corpus
        row = disc.evaluate_discontinuous_df(gold, pred).collect()[0]
        # same corpus through the pure port, doc by doc — recompose
        gold_by, pred_by = {}, {}
        for r in gold.collect():
            gold_by.setdefault(r.url, []).append(
                _g([tuple(s) for s in r.spans], r.entity_type))
        for r in pred.collect():
            pred_by.setdefault(r.url, []).append(
                _g([tuple(s) for s in r.spans], r.entity_type))
        tot = {"num_gold": 0, "num_pred": 0, "exact": 0, "boundary": 0,
               "pp": 0.0, "pr": 0.0}
        for url in set(gold_by) | set(pred_by):
            c = disc._match_counts(gold_by.get(url, []),
                                   pred_by.get(url, []), True)
            tot["num_gold"] += c["num_gold"]
            tot["num_pred"] += c["num_pred"]
            tot["exact"] += c["exact_matches"]
            tot["boundary"] += c["boundary_matches"]
            tot["pp"] += c["partial_precision_sum"]
            tot["pr"] += c["partial_recall_sum"]
        assert row.num_gold == tot["num_gold"] == 4
        assert row.num_predicted == tot["num_pred"] == 5
        assert row.exact_matches == tot["exact"] == 1
        assert row.boundary_matches == tot["boundary"] == 2  # exact ⊂ boundary
        assert row.partial_span_precision == pytest.approx(tot["pp"] / 5)
        assert row.partial_span_recall == pytest.approx(tot["pr"] / 4)

    def test_per_type(self, spark, corpus):
        gold, pred = corpus
        counts = disc.match_counts_df(gold, pred)
        by = {r.entity_type: r for r in disc.per_type_metrics(counts).collect()}
        assert by["ADR"].gold_count == 3 and by["ADR"].pred_count == 3
        assert by["ADR"].exact_matches == 1
        assert by["drug"].gold_count == 1 and by["drug"].pred_count == 2

    def test_empty_corpus_all_ones(self, spark):
        empty = spark.createDataFrame(
            [], "url string, entity_type string, spans array<array<long>>")
        row = disc.evaluate_discontinuous_df(empty, empty).collect()[0]
        assert row.exact_f1 == 1.0 and row.partial_span_f1 == 1.0
        assert row.num_gold == 0

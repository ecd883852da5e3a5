"""Error-analysis port (reference transcriptions:
anno/src/eval/error_analysis.rs:656-734 test vectors + the greedy
dominance rule), plus the distributed cogroup operator."""

from __future__ import annotations

from anno_spark.eval.error_analysis import (
    categorize_errors,
    span_overlap,
)


def _cats(rows):
    return [r[0] for r in rows]


class TestCoreMatcher:
    def test_type_error_detection(self):
        # error_analysis.rs:660-675
        rows = categorize_errors(
            [("Google", "LOC", 0, 6)], [("Google", "ORG", 0, 6)]
        )
        assert _cats(rows) == ["type_error"]

    def test_boundary_error_detection(self):
        # error_analysis.rs:677-691 — overlap 0.4 needs the low threshold
        rows = categorize_errors(
            [("John", "PER", 0, 4)], [("John Smith", "PER", 0, 10)],
            overlap_threshold=0.3,
        )
        assert _cats(rows) == ["boundary_error"]

    def test_below_threshold_becomes_fp_plus_fn(self):
        # same vector at the 0.5 default: overlap 0.4 doesn't match
        rows = categorize_errors(
            [("John", "PER", 0, 4)], [("John Smith", "PER", 0, 10)]
        )
        assert sorted(_cats(rows)) == ["false_negative", "false_positive"]

    def test_false_positive_detection(self):
        # error_analysis.rs:693-702
        rows = categorize_errors([("Random", "PER", 0, 6)], [])
        assert _cats(rows) == ["false_positive"]

    def test_false_negative_detection(self):
        # error_analysis.rs:704-713
        rows = categorize_errors([], [("John", "PER", 0, 4)])
        assert _cats(rows) == ["false_negative"]

    def test_correct_prediction_emits_nothing(self):
        # error_analysis.rs:715-723
        assert categorize_errors(
            [("John", "PER", 0, 4)], [("John", "PER", 0, 4)]
        ) == []

    def test_partial_match_wrong_type_and_boundary(self):
        rows = categorize_errors(
            [("hn Smit", "LOC", 2, 9)], [("John Smith", "PER", 0, 10)],
            overlap_threshold=0.5,
        )
        assert _cats(rows) == ["partial_match"]

    def test_dominance_prefers_exact_over_bigger_overlap(self):
        # an exact-boundary wrong-type pred beats an inexact type-match
        # with high overlap (error_analysis.rs:283-295)
        rows = categorize_errors(
            [("John Smith", "LOC", 0, 10), ("John Smit", "PER", 0, 9)],
            [("John Smith", "PER", 0, 10)],
        )
        by_cat = {r[0]: r for r in rows}
        assert "type_error" in by_cat  # exact one consumed the gold
        assert by_cat["type_error"][2] == "LOC"
        assert "false_positive" in by_cat  # the other stays unmatched

    def test_each_pred_consumed_once(self):
        # one prediction cannot satisfy two golds
        rows = categorize_errors(
            [("John", "PER", 0, 4)],
            [("John", "PER", 0, 4), ("John", "PER", 0, 4)],
        )
        assert _cats(rows) == ["false_negative"]

    def test_span_overlap_is_jaccard(self):
        assert span_overlap(0, 4, 0, 10) == 0.4
        assert span_overlap(0, 4, 4, 8) == 0.0
        assert span_overlap(0, 10, 0, 10) == 1.0


class TestDistributedOperator:
    def test_cogroup_matches_core_per_url(self, spark):
        from anno_spark.eval.error_analysis import (
            error_instances,
            error_summary,
        )

        pred_rows = [
            ("u1", "Google", "LOC", 0, 6),      # type error
            ("u1", "Random", "PER", 20, 26),    # false positive
            ("u2", "John", "PER", 0, 4),        # correct
        ]
        gold_rows = [
            ("u1", "Google", "ORG", 0, 6),
            ("u2", "John", "PER", 0, 4),
            ("u3", "Paris", "LOC", 5, 10),      # false negative (no preds)
        ]
        schema = "url string, text string, entity_type string, start int, end int"
        inst = error_instances(
            spark.createDataFrame(pred_rows, schema),
            spark.createDataFrame(gold_rows, schema),
        )
        got = {(r["url"], r["category"]) for r in inst.collect()}
        assert got == {
            ("u1", "type_error"),
            ("u1", "false_positive"),
            ("u3", "false_negative"),
        }
        summ = {r["category"]: (r["n"], r["rate"]) for r in error_summary(inst).collect()}
        assert summ["type_error"] == (1, round(1 / 3, 6))
        assert summ["boundary_error"] == (0, 0.0)
        assert summ["partial_match"][0] == 0

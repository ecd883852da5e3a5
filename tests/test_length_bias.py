"""Length-bias eval port (reference transcriptions:
anno/src/eval/length_bias.rs:652-721 test vectors), plus a
pure-python-vs-relational differential on the report math and an
end-to-end run through the real extraction stack."""

from __future__ import annotations

from pyspark.sql import functions as F

from anno_spark.eval.length_bias import (
    LENGTH_VARIED_EXAMPLES,
    annotate_lengths,
    bucket_rates,
    evaluate_length_bias,
    length_bias_report,
    length_varied_dataset,
    recognition_table,
)


def _py_char_bucket(n: int) -> str:
    # length_bias.rs:54-62
    if n <= 5:
        return "VeryShort"
    if n <= 15:
        return "Short"
    if n <= 30:
        return "Medium"
    if n <= 50:
        return "Long"
    return "VeryLong"


def _py_word_bucket(n: int) -> str:
    # length_bias.rs:92-99
    if n <= 1:
        return "SingleWord"
    if n == 2:
        return "TwoWords"
    if n == 3:
        return "ThreeWords"
    return "FourPlusWords"


class TestBucketClassification:
    def test_length_bucket_classification(self, spark):
        # length_bias.rs:656-663
        df = spark.createDataFrame(
            [(3,), (10,), (25,), (40,), (60,)], "char_length int"
        )
        from anno_spark.eval.length_bias import char_bucket

        got = [r[0] for r in df.select(char_bucket("char_length")).collect()]
        assert got == ["VeryShort", "Short", "Medium", "Long", "VeryLong"]

    def test_word_count_bucket(self, spark):
        # length_bias.rs:666-674
        df = spark.createDataFrame([(1,), (2,), (3,), (5,)], "word_count int")
        from anno_spark.eval.length_bias import word_bucket

        got = [r[0] for r in df.select(word_bucket("word_count")).collect()]
        assert got == ["SingleWord", "TwoWords", "ThreeWords", "FourPlusWords"]

    def test_example_construction(self, spark):
        # length_bias.rs:710-719 — "John Smith": char 10, word 2
        df = annotate_lengths(
            spark.createDataFrame(
                [("u", "John Smith", "John Smith attended.", "PER")],
                "url string, entity_text string, sentence string, entity_type string",
            )
        )
        row = df.collect()[0]
        assert row["char_length"] == 10
        assert row["word_count"] == 2
        assert row["char_bucket"] == "Short"
        assert row["word_bucket"] == "TwoWords"


class TestDataset:
    def test_create_length_dataset_covers_buckets(self, spark):
        # length_bias.rs:677-695
        ds = length_varied_dataset(spark)
        buckets = {r[0] for r in ds.select("char_bucket").distinct().collect()}
        for b in ("VeryShort", "Short", "Medium", "Long"):
            assert b in buckets, f"should have {b} entities"

    def test_entity_type_coverage(self, spark):
        # length_bias.rs:698-707 (engine-space labels)
        ds = length_varied_dataset(spark)
        types = {r[0] for r in ds.select("entity_type").distinct().collect()}
        assert {"PER", "ORG", "LOC"} <= types

    def test_unicode_char_length(self, spark):
        # chars().count() semantics: "José María García" is 17 codepoints
        # (precomposed accents), not 17+ bytes
        ds = length_varied_dataset(spark)
        row = ds.where(F.col("entity_text").startswith("José")).collect()[0]
        assert row["char_length"] == len("José María García") == 17


class TestReportDifferential:
    """Relational report vs a from-scratch python fold of the reference
    algorithm (length_bias.rs:204-325) on a deterministic synthetic
    recognition pattern."""

    def _synthetic(self, spark):
        rows = []
        for i, (e, s, t) in enumerate(LENGTH_VARIED_EXAMPLES):
            # deterministic pseudo-model: miss every 3rd example and
            # everything longer than 40 chars
            recognized = 0 if (i % 3 == 0 or len(e) > 40) else 1
            rows.append((f"u{i:03d}", e, s, t, recognized))
        df = annotate_lengths(
            spark.createDataFrame(
                [(u, e, s, t) for (u, e, s, t, _) in rows],
                "url string, entity_text string, sentence string, entity_type string",
            )
        )
        # attach the flag by join (deterministic by url, not by row order)
        flags = spark.createDataFrame(
            [(u, r) for (u, e, s, t, r) in rows], "url string, recognized int"
        )
        return df.join(flags, "url"), rows

    def _py_report(self, rows):
        recog, missed = [], []
        by = {"char": {}, "word": {}, "type": {}}
        for u, e, s, t, r in rows:
            n_char = len(e)
            n_word = len(e.split())
            keys = (
                ("char", _py_char_bucket(n_char)),
                ("word", _py_word_bucket(n_word)),
                ("type", t),
            )
            for dim, k in keys:
                c, tot = by[dim].get(k, (0, 0))
                by[dim][k] = (c + r, tot + 1)
            (recog if r else missed).append(n_char)

        rates = {
            dim: {k: c / tot for k, (c, tot) in d.items()} for dim, d in by.items()
        }

        def gap(d):
            return max(d.values()) - min(d.values()) if len(d) >= 2 else 0.0

        short = sum(
            rates["word"].get(k, 0.0) for k in ("SingleWord", "TwoWords")
        ) / 2.0
        long_ = rates["word"].get("FourPlusWords", short)
        return {
            "overall_recognition_rate": len(recog) / len(rows),
            "char_length_parity_gap": gap(rates["char"]),
            "word_count_parity_gap": gap(rates["word"]),
            "short_vs_long_gap": abs(short - long_),
            "avg_recognized_char_length": sum(recog) / len(recog) if recog else 0.0,
            "avg_missed_char_length": sum(missed) / len(missed) if missed else 0.0,
            "total_tested": len(rows),
            "rates": rates,
        }

    def test_report_matches_python_fold(self, spark):
        df, rows = self._synthetic(spark)
        got = length_bias_report(df).collect()[0].asDict()
        want = self._py_report(rows)
        for k in (
            "overall_recognition_rate",
            "char_length_parity_gap",
            "word_count_parity_gap",
            "short_vs_long_gap",
            "avg_recognized_char_length",
            "avg_missed_char_length",
        ):
            assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
        assert got["total_tested"] == want["total_tested"]

    def test_bucket_rates_match_python_fold(self, spark):
        df, rows = self._synthetic(spark)
        want = self._py_report(rows)["rates"]
        for r in bucket_rates(df).collect():
            assert abs(r["rate"] - want[r["dimension"]][r["bucket"]]) < 1e-9

    def test_all_recognized_and_none_recognized_edges(self, spark):
        base = annotate_lengths(
            spark.createDataFrame(
                [("u0", "IBM", "x", "ORG"), ("u1", "John Smith", "x", "PER")],
                "url string, entity_text string, sentence string, entity_type string",
            )
        )
        all_hit = length_bias_report(
            base.withColumn("recognized", F.lit(1))
        ).collect()[0]
        assert all_hit["overall_recognition_rate"] == 1.0
        assert all_hit["avg_missed_char_length"] == 0.0  # length_bias.rs:305-310
        none_hit = length_bias_report(
            base.withColumn("recognized", F.lit(0))
        ).collect()[0]
        assert none_hit["overall_recognition_rate"] == 0.0
        assert none_hit["avg_recognized_char_length"] == 0.0


class TestEndToEnd:
    def test_real_extractor_over_reference_dataset(self, spark):
        report = evaluate_length_bias(spark).collect()[0]
        assert report["total_tested"] == len(LENGTH_VARIED_EXAMPLES) == 57
        # deterministic stack → exact regression floor (27/57 on the
        # reference set; long titled/compound forms miss — the bias the
        # eval exists to show)
        assert abs(report["overall_recognition_rate"] - 27 / 57) < 1e-9
        assert report["char_length_parity_gap"] > 0.0
        # the bias signature: missed entities are longer on average
        assert report["avg_missed_char_length"] > report["avg_recognized_char_length"]

    def test_recognition_containment_rule(self, spark):
        # length_bias.rs:224-230: span slice must CONTAIN the entity
        # text — a type-matching mention elsewhere must not count
        ex = annotate_lengths(
            spark.createDataFrame(
                [("u0", "IBM", "IBM announced products.", "ORG")],
                "url string, entity_text string, sentence string, entity_type string",
            )
        )
        mentions_wrong_span = spark.createDataFrame(
            [("u0", "announced", "ORG", 4, 13)],
            "url string, text string, entity_type string, start int, end int",
        )
        got = recognition_table(ex, mentions_wrong_span).collect()[0]
        assert got["recognized"] == 0
        mentions_right = spark.createDataFrame(
            [("u0", "IBM", "ORG", 0, 3)],
            "url string, text string, entity_type string, start int, end int",
        )
        assert recognition_table(ex, mentions_right).collect()[0]["recognized"] == 1

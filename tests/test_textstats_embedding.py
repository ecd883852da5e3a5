"""Tests for the BPE-ish token counter, rolling-hash fingerprint, and
embedding-cosine near-dup (the round-2 additions to the training-data
op families). Cross-engine parity at corpus scale is covered by
tests/test_oracle_parity.py (doc_fingerprints / dedup_embedding)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestDocFingerprints:
    def _fp(self, spark, rows):
        from anno_spark.operators.textstats import doc_fingerprints

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r["doc_id"]: r for r in doc_fingerprints(df).collect()}

    def test_bpe_vs_ws_tokens(self, spark):
        out = self._fp(spark, [(1, "Hello world, 42 foo-bar!"), (2, ""), (3, "   ")])
        # "Hello|world|,|42|foo|-|bar|!" = 8 BPE-ish vs 4 ws tokens
        assert out[1]["bpe_tokens"] == 8 and out[1]["ws_tokens"] == 4
        assert out[2]["bpe_tokens"] == 0 and out[2]["ws_tokens"] == 0
        assert out[3]["bpe_tokens"] == 0 and out[3]["ws_tokens"] == 0

    def test_rolling_hash_is_polynomial(self, spark):
        from anno_spark.operators.textstats import ROLL_BASE, ROLL_MOD

        out = self._fp(spark, [(1, "abc"), (2, "")])

        def ref(s):
            h = 0
            for ch in s:
                h = (h * ROLL_BASE + ord(ch)) % ROLL_MOD
            return h

        assert out[1]["rolling_hash"] == ref("abc")
        assert out[2]["rolling_hash"] == 0

    def test_rolling_hash_order_sensitive(self, spark):
        out = self._fp(spark, [(1, "ab"), (2, "ba")])
        assert out[1]["rolling_hash"] != out[2]["rolling_hash"]

    def test_cap_makes_long_prefix_equal(self, spark):
        from anno_spark.operators.textstats import ROLL_MAX_CHARS

        base = "x" * ROLL_MAX_CHARS
        out = self._fp(spark, [(1, base + "AAAA"), (2, base + "BBBB")])
        assert out[1]["rolling_hash"] == out[2]["rolling_hash"]


class TestEmbeddingNearDup:
    def test_duplicates_cluster_unrelated_do_not(self, spark):
        from anno_spark.operators.dedup import doc_vectors, embedding_near_duplicates

        dup = "the quick brown fox jumps over the lazy dog " * 8
        near = dup + "extra trailing words appended here"
        other = "completely different subject matter about astrophysics " * 8
        docs = spark.createDataFrame(
            [(1, dup), (2, dup), (3, near), (4, other)],
            "doc_id bigint, text string",
        )
        dv = doc_vectors(docs)
        clusters = embedding_near_duplicates(dv, min_cosine=0.8, max_hamming=16)
        got = {}
        for r in clusters.collect():
            got.setdefault(r["cluster_id"], set()).add(r["doc_id"])
        assert {frozenset(s) for s in got.values()} == {frozenset({1, 2, 3})}

    def test_vectors_unit_norm_and_deterministic(self, spark):
        from anno_spark.operators.dedup import doc_vectors

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "")],
            "doc_id bigint, text string",
        )
        rows = {r["doc_id"]: r for r in doc_vectors(docs).collect()}
        v1, v2 = rows[1]["v"], rows[2]["v"]
        assert v1 == v2 and rows[1]["bhash"] == rows[2]["bhash"]
        assert abs(sum(x * x for x in v1) - 1.0) < 1e-9
        assert rows[3]["v"] == [0.0] * len(v1) and rows[3]["bhash"] == 0


class TestUrlStats:
    def test_url_parts_fields(self, spark):
        from anno_spark.operators.urlstats import url_parts

        df = spark.createDataFrame(
            [
                ("https://News.Example-42.test/politics/493",),
                ("https://sub.a.example.org/",),
                ("https://localhost",),
            ],
            "url string",
        )
        rows = {r["url"]: r for r in url_parts(df).collect()}
        r = rows["https://News.Example-42.test/politics/493"]
        assert r["host"] == "news.example-42.test"
        assert r["domain"] == "example-42.test"
        assert r["tld"] == "test" and r["path_depth"] == 2
        r = rows["https://sub.a.example.org/"]
        assert r["domain"] == "example.org" and r["path_depth"] == 0
        # single-label host: domain falls back to the host itself
        r = rows["https://localhost"]
        assert r["domain"] == "localhost" and r["tld"] == "localhost"

    def test_domain_profile_counts(self, spark):
        import datetime as dt

        from anno_spark.operators.urlstats import domain_profile

        df = spark.createDataFrame(
            [
                ("https://a.x.test/1", dt.datetime(2024, 1, 2), "en"),
                ("https://b.x.test/1/2", dt.datetime(2024, 1, 1), "de"),
                ("https://c.y.test/", dt.datetime(2024, 1, 3), "en"),
            ],
            "url string, warc_ts timestamp, lang string",
        )
        out = {r["domain"]: r for r in domain_profile(df).collect()}
        assert out["x.test"]["n_pages"] == 2 and out["x.test"]["n_hosts"] == 2
        assert out["x.test"]["n_langs"] == 2
        assert out["x.test"]["first_crawl"] == dt.datetime(2024, 1, 1)
        assert abs(out["x.test"]["avg_path_depth"] - 1.5) < 1e-9
        assert out["y.test"]["n_pages"] == 1 and out["y.test"]["avg_path_depth"] == 0.0


class TestCorpusCuration:
    def test_precedence_and_keep_first(self, spark):
        from anno_spark.operators.curation import curate_corpus

        good = (
            "the quick brown fox jumps over the lazy dog and it was a fine "
            "day for all of the animals in this story to be at the park "
        ) * 4
        near = good + "with a few extra words at the end of it"
        docs = spark.createDataFrame(
            [
                (1, good, "en"),            # kept (first copy)
                (2, good, "en"),            # exact_dup of 1
                (3, near, "en"),            # near_dup of {1,2} cluster
                (4, good + " unique", "zh"),  # near_dup wins over lang
                (5, "000 111 !!! " * 30, "en"),  # low quality (no alpha/stopwords)
                (6, "completely different decent text about the state of "
                    "the world and all that is in it today my friends", "fr"),
            ],
            "doc_id bigint, text string, lang string",
        )
        out = {r["doc_id"]: r for r in curate_corpus(
            docs, min_quality=0.5, langs=("en", "fr")).collect()}
        assert out[1]["keep"] and out[1]["drop_reason"] is None
        assert out[2]["drop_reason"] == "exact_dup"
        assert out[3]["drop_reason"] == "near_dup"
        assert out[4]["drop_reason"] == "near_dup"  # precedence over lang
        assert out[5]["drop_reason"] == "low_quality"
        assert out[6]["keep"]

    def test_lang_filter(self, spark):
        from anno_spark.operators.curation import curate_corpus

        docs = spark.createDataFrame(
            [(1, "a perfectly fine text about the things that matter to "
                 "all of us in the world today", "ja")],
            "doc_id bigint, text string, lang string",
        )
        row = curate_corpus(docs, min_quality=0.0, langs=("en",)).collect()[0]
        assert row["drop_reason"] == "lang" and not row["keep"]

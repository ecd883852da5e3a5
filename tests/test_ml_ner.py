"""N5/N6 — ML NER backend seam tests (mock model in the executor)."""

from __future__ import annotations

import pytest


class TestMockModel:
    def test_returns_fixed_entities(self):
        from anno_spark.operators.ml_ner import MockModel

        m = MockModel(
            entities=[{"text": "John", "entity_type": "PER", "start": 0, "end": 4,
                       "confidence": 0.9}]
        )
        out = m.extract_batch(["John went home."])
        assert out[0][0]["text"] == "John"

    def test_validates_offsets(self):
        # lib.rs:373-385 — end beyond text length is an error
        from anno_spark.operators.ml_ner import MockModel

        m = MockModel(
            entities=[{"text": "John", "entity_type": "PER", "start": 0, "end": 40,
                       "confidence": 0.9}]
        )
        with pytest.raises(ValueError, match="exceeds text length"):
            m.extract_batch(["short"])

    def test_validates_surface_text(self):
        # lib.rs:387-395 — span must reproduce the expected surface
        from anno_spark.operators.ml_ner import MockModel

        m = MockModel(
            entities=[{"text": "John", "entity_type": "PER", "start": 0, "end": 4,
                       "confidence": 0.9}]
        )
        with pytest.raises(ValueError, match="text mismatch"):
            m.extract_batch(["Mary went home."])

    def test_rejects_bad_construction(self):
        from anno_spark.operators.ml_ner import MockModel

        with pytest.raises(ValueError, match="start must be < end"):
            MockModel(entities=[{"text": "x", "entity_type": "PER", "start": 4,
                                 "end": 4, "confidence": 0.9}])


class TestExecutorSeam:
    def test_ml_mentions_table(self, spark):
        from anno_spark.operators.ml_ner import KeywordModel, ml_mentions_table

        pages = spark.createDataFrame(
            [
                ("u1", "Apple hired Bob. Apple grew."),
                ("u2", "Nothing to see."),
                ("u3", "Bob met Apple executives."),
            ],
            "url string, text string",
        )
        out = ml_mentions_table(
            pages,
            lambda: KeywordModel({"Apple": "ORG", "Bob": "PER"}),
            cache_key="test-kw",
        ).collect()
        by_url: dict = {}
        for r in out:
            by_url.setdefault(r["url"], []).append(r)
        assert len(by_url["u1"]) == 3  # Apple ×2 + Bob
        assert "u2" not in by_url
        assert {r["entity_type"] for r in by_url["u3"]} == {"ORG", "PER"}
        assert all(r["model"] == "keyword-stub" for r in out)
        # offsets are real char offsets into the page text
        r = [x for x in by_url["u1"] if x["start"] == 0][0]
        assert r["text"] == "Apple" and r["end"] == 5

    def test_worker_model_cached_per_key(self):
        from anno_spark.operators import ml_ner

        calls = []

        def factory():
            calls.append(1)
            return ml_ner.KeywordModel({"x": "ORG"}, name="cached")

        ml_ner._MODEL_CACHE.pop("cache-test", None)
        a = ml_ner._worker_model(factory, "cache-test")
        b = ml_ner._worker_model(factory, "cache-test")
        assert a is b and len(calls) == 1

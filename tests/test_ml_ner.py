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


class TestNumpyTransformer:
    """VERDICT r02 next #6: the seam exercised by a real tensor workload
    (batch matmuls, attention masks, span decoding), not just string
    search."""

    def _texts(self):
        return [
            "Alice met Bob at the Paris office of Initech Corp yesterday.",
            "quarterly revenue grew while the board met in Berlin",
            "",
            "one",
            "Server logs show errors from the Tokyo cluster after the deploy "
            "finished and the team rolled back the release candidate build.",
        ]

    def test_deterministic_and_batch_independent(self):
        from anno_spark.operators.ml_ner import NumpyTransformerModel

        m1 = NumpyTransformerModel()
        m2 = NumpyTransformerModel()
        texts = self._texts()
        full = m1.extract_batch(texts)
        assert full == m2.extract_batch(texts)  # same seed → same weights
        # padding to a different batch max-length must not change a doc's
        # spans (masked positions contribute exactly zero attention)
        for i, t in enumerate(texts):
            assert m1.extract_batch([t])[0] == full[i], i

    def test_span_offsets_are_real(self):
        from anno_spark.operators.ml_ner import NumpyTransformerModel

        m = NumpyTransformerModel()
        texts = self._texts()
        for t, ents in zip(texts, m.extract_batch(texts)):
            for e in ents:
                assert t[e["start"]:e["end"]] == e["text"]
                assert e["entity_type"] in ("PER", "ORG", "LOC")
                assert 0.0 <= e["confidence"] <= 1.0
        # the model is arbitrary but must actually emit spans on real text
        assert any(m.extract_batch(texts))

    def test_parity_through_spark_seam(self, spark):
        """Driver-local inference == through-Spark inference (arbitrary
        Arrow batching, per-worker weight synthesis via the cache)."""
        from anno_spark.operators.ml_ner import (
            NumpyTransformerModel,
            ml_mentions_table,
        )

        texts = self._texts() * 8  # spread over several partitions/batches
        pages = spark.createDataFrame(
            [(f"u{i}", t) for i, t in enumerate(texts)], "url string, text string"
        ).repartition(8)
        rows = ml_mentions_table(
            pages, NumpyTransformerModel, cache_key="numpy-mini"
        ).collect()
        got: dict = {}
        for r in rows:
            got.setdefault(r["url"], []).append(
                {
                    "text": r["text"], "entity_type": r["entity_type"],
                    "start": r["start"], "end": r["end"],
                    "confidence": r["confidence"],
                }
            )
        local = NumpyTransformerModel()
        for i, t in enumerate(texts):
            expect = local.extract_batch([t])[0]
            assert got.get(f"u{i}", []) == expect, i
        assert all(r["model"] == "numpy-mini-transformer" for r in rows)

    def test_weights_synthesized_once_per_worker(self):
        from anno_spark.operators import ml_ner

        builds = []

        def factory():
            builds.append(1)
            return ml_ner.NumpyTransformerModel()

        ml_ner._MODEL_CACHE.pop("numpy-cache-test", None)
        a = ml_ner._worker_model(factory, "numpy-cache-test")
        b = ml_ner._worker_model(factory, "numpy-cache-test")
        assert a is b and len(builds) == 1
        # the cached object really carries the synthesized tensors
        assert a.embed.shape == (a.vocab_size, a.dim)


class TestOnnxAdapter:
    """VERDICT r03 next #8: the real-weights adapter is import-guarded —
    it must fail CLEANLY here (no onnxruntime in the sandbox) and run
    for real the day the dependency exists."""

    def test_raises_cleanly_without_onnxruntime(self):
        from anno_spark.operators.ml_ner import OnnxNerModel

        try:
            import onnxruntime  # noqa: F401
            pytest.skip("onnxruntime unexpectedly present; guard n/a")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="requires onnxruntime"):
            OnnxNerModel("/nonexistent/model.onnx", labels=("O", "PER"))

    def test_real_session_span_decode(self, tmp_path):
        """Runs only when onnxruntime + onnx exist: author a minimal
        token-classification graph (identity-ish logits via Gather from
        a constant table keyed by input id parity) and assert the
        adapter's whole-batch run + contiguous-run span decode."""
        pytest.importorskip("onnxruntime")
        onnx = pytest.importorskip("onnx")
        import numpy as np
        from onnx import TensorProto, helper

        # logits[b, t] = table[input_ids[b, t] % 2] — ids are FNV hashes,
        # so parity is a deterministic pseudo-label per token
        table = np.array([[5.0, 0.0], [0.0, 5.0]], dtype=np.float32)
        mod2 = helper.make_node(
            "Mod", ["input_ids", "two"], ["parity"], fmod=0
        )
        gather = helper.make_node("Gather", ["table", "parity"], ["logits"])
        graph = helper.make_graph(
            [mod2, gather],
            "parity-ner",
            [
                helper.make_tensor_value_info(
                    "input_ids", TensorProto.INT64, ["B", "L"]
                ),
                helper.make_tensor_value_info(
                    "attention_mask", TensorProto.INT64, ["B", "L"]
                ),
            ],
            [
                helper.make_tensor_value_info(
                    "logits", TensorProto.FLOAT, ["B", "L", 2]
                )
            ],
            initializer=[
                helper.make_tensor("two", TensorProto.INT64, [], [2]),
                helper.make_tensor(
                    "table", TensorProto.FLOAT, [2, 2], table.flatten()
                ),
            ],
        )
        path = str(tmp_path / "parity.onnx")
        onnx.save(helper.make_model(graph), path)

        from anno_spark.operators.ml_ner import OnnxNerModel

        m = OnnxNerModel(path, labels=("O", "TOK"))
        out = m.extract_batch(["alpha beta gamma", ""])
        assert len(out) == 2 and out[1] == []
        for e in out[0]:
            assert e["entity_type"] == "TOK"
            assert e["text"] == "alpha beta gamma"[e["start"]:e["end"]]

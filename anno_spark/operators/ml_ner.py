"""N5/N6 — the ML NER backend seam (SURVEY §2.3).

The reference's headline quality tier runs GLiNER/BERT ONNX models
(anno/src/backends/gliner_onnx.rs:1-1265, onnx.rs:1-660; README reports
86-92% F1 vs ~65% heuristic). Shipping those weights is out of scope
here, but the EXECUTION SEAM is real and tested: a batched model
protocol, a per-executor-process model cache (models load once per
Python worker, not once per batch), and an Arrow-batched mapInPandas
operator that emits the same mention schema as the heuristic stack —
plugging a real ONNX session into :class:`MlModel` is the only change a
production deployment needs.

Includes the reference's MockModel (anno/src/lib.rs:310-430) — fixed
entities with offset/text validation — and a deterministic KeywordModel
as the executable stand-in used by tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ML_MENTION_SCHEMA = (
    "url string, text string, entity_type string, start int, end int, "
    "confidence double, model string"
)


class MlModel:
    """Batched model protocol: one call per Arrow batch of documents.

    ONNX-shaped on purpose: real backends tokenize and run the whole
    batch through one session.run, so the seam hands them lists, never
    single rows."""

    name: str = "base"

    def extract_batch(self, texts: list[str]) -> list[list[dict]]:
        """→ per-text list of {text, entity_type, start, end, confidence}."""
        raise NotImplementedError


class MockModel(MlModel):
    """Reference MockModel port (lib.rs:310-430): returns a fixed entity
    list; validates offsets and surface text against the input (char
    offsets, lib.rs:373-395) unless ``validate=False``."""

    def __init__(self, name: str = "test-mock", entities: list[dict] | None = None,
                 validate: bool = True):
        for i, e in enumerate(entities or []):
            if not e["start"] < e["end"]:
                raise ValueError(f"MockModel entity {i}: start must be < end")
            if not 0.0 <= e["confidence"] <= 1.0:
                raise ValueError(f"MockModel entity {i}: confidence must be in [0,1]")
        self.name = name
        self.entities = entities or []
        self.validate = validate

    def _validate(self, text: str) -> None:
        n = len(text)
        for i, e in enumerate(self.entities):
            if e["end"] > n:
                raise ValueError(
                    f"MockModel entity {i} '{e['text']}': end offset "
                    f"({e['end']}) exceeds text length ({n} chars)"
                )
            actual = text[e["start"]:e["end"]]
            if actual != e["text"]:
                raise ValueError(
                    f"MockModel entity {i} text mismatch: expected "
                    f"'{e['text']}' at [{e['start']},{e['end']}), found '{actual}'"
                )

    def extract_batch(self, texts: list[str]) -> list[list[dict]]:
        out = []
        for t in texts:
            if self.validate and self.entities:
                self._validate(t)
            out.append([dict(e) for e in self.entities])
        return out


class KeywordModel(MlModel):
    """Deterministic executable stand-in for an ONNX span classifier:
    finds every occurrence of the vocabulary surfaces. Used by tests to
    prove the executor seam (per-worker caching, batching, schema)."""

    def __init__(self, vocab: dict[str, str], confidence: float = 0.88,
                 name: str = "keyword-stub"):
        self.vocab = dict(vocab)
        self.confidence = confidence
        self.name = name

    def extract_batch(self, texts: list[str]) -> list[list[dict]]:
        out = []
        for t in texts:
            ents = []
            for surface, etype in self.vocab.items():
                pos = t.find(surface)
                while pos >= 0:
                    ents.append(
                        {
                            "text": surface,
                            "entity_type": etype,
                            "start": pos,
                            "end": pos + len(surface),
                            "confidence": self.confidence,
                        }
                    )
                    pos = t.find(surface, pos + 1)
            ents.sort(key=lambda e: (e["start"], e["end"]))
            out.append(ents)
        return out


# per-Python-worker model cache: an ONNX session costs seconds to build
# and hundreds of MB — it must be constructed once per executor process
# (NOT per Arrow batch, NOT per task) and reused for the worker lifetime
_MODEL_CACHE: dict = {}


def _worker_model(factory: Callable[[], MlModel], key: str) -> MlModel:
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = factory()
        _MODEL_CACHE[key] = model
    return model


def ml_mentions_table(
    pages: DataFrame,
    model_factory: Callable[[], MlModel],
    cache_key: str = "default",
    text_col: str = "text",
) -> DataFrame:
    """pages → ML-extracted mentions (same downstream shape as the
    heuristic stack; ``model`` column carries provenance).

    The factory runs inside the executor (shipped by closure); the
    resulting model is cached per worker process via ``cache_key``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _worker_model(model_factory, cache_key)
        for pdf in batches:
            texts = [t or "" for t in pdf[text_col]]
            per_doc = model.extract_batch(texts)
            rows = []
            for url, ents in zip(pdf["url"], per_doc):
                for e in ents:
                    rows.append(
                        {
                            "url": url,
                            "text": e["text"],
                            "entity_type": e["entity_type"],
                            "start": e["start"],
                            "end": e["end"],
                            "confidence": e["confidence"],
                            "model": model.name,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "text", "entity_type", "start", "end",
                         "confidence", "model"],
            )

    return pages.select("url", F.col(text_col).alias(text_col)).mapInPandas(
        run, schema=ML_MENTION_SCHEMA
    )

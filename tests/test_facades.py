"""Eval orchestration facades + visual NER eval.

Transcribed from the reference test surfaces:
* visual.rs:492-585 in-module tests (box geometry, perfect/text-only
  match, synthetic validity)
* advanced_harness.rs:295-328 (gold-vs-gold = 1.0 across all three
  tasks; dataset stats non-empty)
* unified_evaluator.rs doc examples (EvalSystem builder → run)
* backend_eval.rs behavior (lenient ±2 match, report structure)
* config_builder.rs builder → TaskEvalConfig field mapping
"""

from __future__ import annotations

import pytest

from anno_spark.eval import advanced_harness as AH
from anno_spark.eval import backend_eval as BE
from anno_spark.eval import discontinuous_data
from anno_spark.eval.config_builder import (
    BiasDatasetConfigBuilder,
    TaskEvalConfigBuilder,
)
from anno_spark.eval.unified import EvalSystem
from anno_spark.eval.visual import (
    BoundingBox,
    VisualEvalConfig,
    VisualGold,
    VisualPrediction,
    evaluate_visual_ner,
    synthetic_visual_examples,
)


class TestBoundingBox:
    def test_area(self):
        assert abs(BoundingBox(0.0, 0.0, 0.5, 0.5).area() - 0.25) < 0.001

    def test_area_inverted_clamps_to_zero(self):
        assert BoundingBox(0.5, 0.5, 0.1, 0.1).area() == 0.0

    def test_iou_identical(self):
        b = BoundingBox(0.1, 0.1, 0.5, 0.5)
        assert abs(b.iou(BoundingBox(0.1, 0.1, 0.5, 0.5)) - 1.0) < 0.001

    def test_iou_no_overlap(self):
        assert BoundingBox(0.0, 0.0, 0.2, 0.2).iou(BoundingBox(0.5, 0.5, 0.7, 0.7)) < 0.001

    def test_iou_partial(self):
        # visual.rs:517-525: 0.0625 / 0.4375 ≈ 0.143
        iou = BoundingBox(0.0, 0.0, 0.5, 0.5).iou(BoundingBox(0.25, 0.25, 0.75, 0.75))
        assert 0.1 < iou < 0.2

    def test_overlaps_threshold(self):
        b = BoundingBox(0.0, 0.0, 0.5, 0.5)
        assert b.overlaps(BoundingBox(0.0, 0.0, 0.5, 0.5), 0.99)
        assert not b.overlaps(BoundingBox(0.25, 0.25, 0.75, 0.75), 0.5)


class TestVisualEval:
    def test_perfect_match(self):
        gold = [VisualGold("Invoice", "DOC", BoundingBox(0.1, 0.1, 0.3, 0.15))]
        pred = [VisualPrediction("Invoice", "DOC", BoundingBox(0.1, 0.1, 0.3, 0.15), 0.95)]
        m = evaluate_visual_ner(gold, pred, VisualEvalConfig())
        assert abs(m.text_f1 - 1.0) < 0.001
        assert abs(m.e2e_f1 - 1.0) < 0.001

    def test_text_only_match(self):
        gold = [VisualGold("Invoice", "DOC", BoundingBox(0.1, 0.1, 0.3, 0.15))]
        pred = [VisualPrediction("Invoice", "DOC", BoundingBox(0.5, 0.5, 0.7, 0.6), 0.95)]
        m = evaluate_visual_ner(gold, pred, VisualEvalConfig())
        assert abs(m.text_f1 - 1.0) < 0.001
        assert m.e2e_f1 < 0.5

    def test_type_mismatch_blocks_match(self):
        gold = [VisualGold("Invoice", "DOC", BoundingBox(0.1, 0.1, 0.3, 0.15))]
        pred = [VisualPrediction("Invoice", "MONEY", BoundingBox(0.1, 0.1, 0.3, 0.15), 0.9)]
        m = evaluate_visual_ner(gold, pred, VisualEvalConfig())
        assert m.text_f1 == 0.0
        cfg = VisualEvalConfig(require_type_match=False)
        m2 = evaluate_visual_ner(gold, pred, cfg)
        assert abs(m2.e2e_f1 - 1.0) < 0.001

    def test_whitespace_normalization(self):
        gold = [VisualGold("Acme  Corp", "ORG", BoundingBox(0.1, 0.1, 0.3, 0.15))]
        pred = [VisualPrediction("Acme Corp", "ORG", BoundingBox(0.1, 0.1, 0.3, 0.15), 0.9)]
        m = evaluate_visual_ner(gold, pred, VisualEvalConfig())
        assert abs(m.text_f1 - 1.0) < 0.001

    def test_synthetic_examples_valid(self):
        examples = synthetic_visual_examples()
        assert examples
        for text, entities in examples:
            assert text
            for e in entities:
                assert 0.0 <= e.bbox.x1 <= 1.0
                assert 0.0 <= e.bbox.y1 <= 1.0
                assert e.bbox.x1 <= e.bbox.x2 <= 1.0
                assert e.bbox.y1 <= e.bbox.y2 <= 1.0

    def test_per_type_support(self):
        gold = [VisualGold("a", "X", BoundingBox(0, 0, 0.1, 0.1)),
                VisualGold("b", "Y", BoundingBox(0.2, 0.2, 0.3, 0.3))]
        m = evaluate_visual_ner(gold, [], VisualEvalConfig())
        assert m.per_type["X"].support == 1
        assert m.per_type["Y"].support == 1
        assert m.text_recall == 0.0

    def test_distributed_matches_local(self, spark):
        # corpus counts through mapInPandas == pooled in-process counts
        examples = synthetic_visual_examples()
        gold_all, pred_all, rows = [], [], []
        for i, (_text, ents) in enumerate(examples):
            gold_rows = [(g.text, g.entity_type, g.bbox.x1, g.bbox.y1,
                          g.bbox.x2, g.bbox.y2) for g in ents]
            # predictions: perfect for doc 0, shifted boxes otherwise
            preds = []
            for g in ents:
                dx = 0.0 if i == 0 else 0.4
                preds.append(VisualPrediction(
                    g.text, g.entity_type,
                    BoundingBox(min(g.bbox.x1 + dx, 1.0), g.bbox.y1,
                                min(g.bbox.x2 + dx, 1.0), g.bbox.y2), 1.0))
            pred_rows = [(p.text, p.entity_type, p.bbox.x1, p.bbox.y1,
                          p.bbox.x2, p.bbox.y2, p.confidence) for p in preds]
            rows.append((f"doc{i}", gold_rows, pred_rows))
            gold_all.extend(ents)
            pred_all.extend(preds)

        from anno_spark.eval.visual import BOX_STRUCT, PRED_STRUCT, visual_metrics_df

        docs = spark.createDataFrame(
            rows,
            f"doc_id string, gold array<struct<{BOX_STRUCT}>>, "
            f"pred array<struct<{PRED_STRUCT}>>",
        )
        dist = visual_metrics_df(docs).collect()[0]
        local = evaluate_visual_ner(gold_all, pred_all, VisualEvalConfig())
        # per-doc matching equals pooled matching here (no cross-doc pairs
        # share types+text across these synthetic docs)
        assert dist["text_matches"] == local.text_matches
        assert dist["e2e_matches"] == local.e2e_matches
        assert dist["num_gold"] == local.num_gold
        assert abs(dist["text_f1"] - local.text_f1) < 1e-9


class TestAdvancedHarness:
    def test_discontinuous_gold_vs_gold(self):
        # advanced_harness.rs:300-308
        m = AH.evaluate_discontinuous_gold_vs_gold()
        assert abs(m["exact_f1"] - 1.0) < 0.001

    def test_relations_gold_vs_gold(self):
        # advanced_harness.rs:310-317
        m = AH.evaluate_relations_gold_vs_gold()
        assert abs(m["strict_f1"] - 1.0) < 0.001

    def test_visual_gold_vs_gold(self):
        # advanced_harness.rs:319-326
        m = AH.evaluate_visual_gold_vs_gold()
        assert abs(m.e2e_f1 - 1.0) < 0.001

    def test_synthetic_dataset_stats(self):
        s = AH.synthetic_dataset_stats()
        assert s.discontinuous_examples > 0
        assert s.discontinuous_entities > 0
        assert s.relation_examples > 0
        assert s.relations > 0
        assert s.visual_examples > 0
        assert s.visual_entities > 0

    def test_discontinuous_dataset_shape(self):
        # discontinuous.rs:393-440 — ≥10 examples, has discontinuous
        # entities, spans valid and inside the text
        examples = discontinuous_data.dataset()
        assert len(examples) >= 10
        assert any(
            len(e["spans"]) > 1 for _t, ents, _d, _dom in examples for e in ents
        )
        for text, ents, _d, _dom in examples:
            for e in ents:
                for s, t in e["spans"]:
                    assert s < t <= len(text), (text, e)

    def test_discontinuous_synthetic_with_null_model(self):
        m = AH.evaluate_discontinuous_synthetic(lambda text: [])
        assert m["exact_f1"] == 0.0
        assert m["num_gold"] == AH.synthetic_dataset_stats().discontinuous_entities

    def test_summary_format(self):
        results = AH.run_all_gold_vs_gold()
        assert len(results) == 3
        for r in results:
            assert "F1=100.0%" in r.summary()


class TestBackendEvaluator:
    def test_entities_match_lenient(self):
        from anno_spark.core.entity import Mention

        # backend_eval.rs:650-668 — same text within ±2 chars matches
        m = Mention("Paris", "LOC", 10, 15, 0.9, "p", "s")
        assert BE.entities_match(m, "Paris", 10, 15)
        assert BE.entities_match(m, "paris", 12, 17)
        assert not BE.entities_match(m, "Paris", 13, 18)
        # exact span matches regardless of text (backend_eval.rs:651-653)
        assert BE.entities_match(m, "London", 10, 15)
        assert not BE.entities_match(m, "London", 11, 16)

    def test_compute_entity_matches_greedy(self):
        from anno_spark.core.entity import Mention

        gold = [("Paris", "LOC", 0), ("Paris", "LOC", 20)]
        pred = [Mention("Paris", "LOC", 0, 5, 0.9, "p", "s")]
        tp, fp, fn_ = BE.compute_entity_matches(pred, gold)
        assert (tp, fp, fn_) == (1, 0, 1)

    def test_run_technology_report(self):
        report = BE.BackendEvaluator().run_technology()
        assert report.total_examples > 0
        assert {b.name for b in report.backends} == {"Pattern", "Heuristic", "Stacked"}
        stacked = next(b for b in report.backends if b.name == "Stacked")
        assert stacked.overall.f1 >= 0.0
        assert stacked.by_domain  # per-domain breakdown populated
        md = report.to_markdown()
        assert "## Overall Results" in md
        assert "| Stacked |" in md

    def test_max_examples_cap(self):
        cfg = BE.EvalConfig(max_examples=3)
        report = BE.BackendEvaluator.with_config(cfg).run_comprehensive()
        assert report.total_examples == 3

    def test_metrics_from_counts(self):
        m = BE.EvalMetrics.from_counts(8, 2, 2)
        assert abs(m.precision - 0.8) < 1e-9
        assert abs(m.recall - 0.8) < 1e-9
        assert abs(m.f1 - 0.8) < 1e-9
        z = BE.EvalMetrics.from_counts(0, 0, 0)
        assert z.precision == z.recall == z.f1 == 0.0

    def test_spark_path_matches_local(self, spark):
        examples = BE.synthetic.dataset("technology")
        local = BE.BackendEvaluator().evaluate_on(examples)
        dist = BE.BackendEvaluator(spark=spark).evaluate_on(examples)
        for lb, db in zip(local.backends, dist.backends):
            assert lb.name == db.name
            assert lb.overall.true_positives == db.overall.true_positives
            assert lb.overall.false_positives == db.overall.false_positives
            assert lb.overall.false_negatives == db.overall.false_negatives
            assert lb.by_domain.keys() == db.by_domain.keys()
            assert lb.by_entity_type.keys() == db.by_entity_type.keys()
            for k in lb.by_entity_type:
                assert lb.by_entity_type[k].true_positives == \
                    db.by_entity_type[k].true_positives


class TestConfigBuilders:
    def test_task_builder_maps_fields(self):
        cfg = (
            TaskEvalConfigBuilder.new()
            .with_backends(["stacked"])
            .add_backend("pattern")
            .add_backend("pattern")  # dedup
            .with_max_examples(10)
            .with_seed(7)
            .with_relation_threshold(0.7)
            .with_confidence_intervals(False)
            .build()
        )
        assert cfg.backends == ["stacked", "pattern"]
        assert cfg.max_examples == 10
        assert cfg.seed == 7
        assert cfg.relation_threshold == 0.7
        assert cfg.confidence_intervals is False
        assert cfg.tasks  # empty builder tasks → all tasks

    def test_bias_builder_defaults(self):
        cfg = BiasDatasetConfigBuilder.new().build()
        assert cfg.frequency_weighted is False
        assert cfg.evaluation_seeds == [42]
        assert cfg.min_samples_per_category == 10
        assert cfg.confidence_level == 0.95

    def test_bias_builder_chain(self):
        cfg = (
            BiasDatasetConfigBuilder.new()
            .with_frequency_weighting(True)
            .with_validation(True)
            .with_min_samples(5)
            .add_seed(7)
            .with_confidence_level(0.9)
            .with_detailed(True)
            .build()
        )
        assert cfg.frequency_weighted and cfg.validate_distributions
        assert cfg.evaluation_seeds == [42, 7]
        assert cfg.detailed


def _toy_provider():
    from anno_spark.eval.dataset_provider import static_provider

    cases = [
        ("Angela Merkel visited Paris.",
         [("Angela Merkel", "PER", 0), ("Paris", "LOC", 22)]),
        ("Microsoft opened an office in Berlin.",
         [("Microsoft", "ORG", 0), ("Berlin", "LOC", 30)]),
    ]
    return static_provider({("wikigold", "ner"): cases,
                            ("conll2003", "ner"): cases})


class TestEvalSystem:
    def test_standard_only(self):
        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_datasets(["wikigold"])
            .with_backends(["stacked"])
            .with_max_examples(5)
            .with_dataset_provider(_toy_provider())
            .run()
        )
        assert results.standard is not None
        assert results.standard.per_backend
        assert "stacked" in results.standard.per_backend
        assert results.metadata.num_examples > 0
        assert 0.0 <= results.standard.f1 <= 1.0
        assert results.bias is None

    def test_weighted_aggregation_consistency(self):
        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_datasets(["wikigold", "conll2003"])
            .with_backends(["stacked", "pattern"])
            .with_max_examples(5)
            .with_dataset_provider(_toy_provider())
            .run()
        )
        s = results.standard
        total_n = sum(b.num_examples for b in s.per_backend.values())
        weighted = sum(b.f1 * b.num_examples for b in s.per_backend.values())
        assert abs(s.f1 - weighted / total_n) < 1e-9

    def test_calibration_placeholder_quirk(self):
        from anno_spark.core import stacked

        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_backends(["stacked"])
            .with_max_examples(2)
            .with_model(stacked.extract_entities, "stacked")
            .with_calibration(True)
            .run()
        )
        assert results.calibration is not None
        assert results.calibration.ece == 0.0
        assert any("No calibrated entities" in w for w in results.warnings)

    def test_data_quality_placeholder_quirk(self):
        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_backends(["stacked"])
            .with_max_examples(2)
            .with_data_quality(True)
            .run()
        )
        assert results.data_quality is not None
        assert results.data_quality.leakage_detected is False
        assert any("data quality" in w.lower() for w in results.warnings)

    def test_bias_requires_spark_warns(self):
        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_backends(["stacked"])
            .with_max_examples(2)
            .with_bias_analysis(True)
            .run()
        )
        assert results.bias is None
        assert any("Bias evaluation failed" in w for w in results.warnings)

    def test_loader_to_harness_end_to_end(self, spark, tmp_path):
        """VERDICT r04 next #7 — S6 loaders → TaskEvaluator end-to-end:
        CoNLL-format gold files on disk, parsed by the distributed
        binaryFile+mapInPandas loader, scored by the standard evaluator
        on the stacked backend."""
        from anno_spark.eval.dataset_provider import spark_dataset_provider
        from anno_spark.eval.task_evaluator import TaskEvalConfig, TaskEvaluator

        # CoNLL gold in wikigold's registered on-disk format; entities
        # the stacked backend can and cannot find
        conll = (
            "Angela B-PER\nMerkel I-PER\nvisited O\nParis B-LOC\n. O\n\n"
            "Microsoft B-ORG\nopened O\nan O\noffice O\nin O\nBerlin B-LOC\n. O\n\n"
        )
        conll2 = (
            "Obscureentity B-MISC\nrose O\n\n"
            "Marie B-PER\nCurie I-PER\nwon O\n\n"
        )
        d = tmp_path / "wikigold"
        d.mkdir()
        (d / "part_000.txt").write_text(conll)
        (d / "part_001.txt").write_text(conll2)

        provider = spark_dataset_provider(spark, {"wikigold": str(d)})
        cases = provider("wikigold", "ner")
        assert len(cases) == 4
        # every gold span is consistent with its sentence text
        for text, gold in cases:
            for etext, _etype, start in gold:
                assert text[start:start + len(etext)] == etext

        cfg = TaskEvalConfig(datasets=["wikigold"], backends=["stacked"])
        cfg.tasks = ["ner"]
        res = TaskEvaluator(provider).evaluate_all(cfg)
        row = next(r for r in res.results
                   if r.dataset == "wikigold" and r.backend == "stacked")
        assert row.success
        assert row.num_examples == 4
        assert 0.0 < row.metrics["f1"] <= 1.0

    def test_unified_with_loader_provider(self, spark, tmp_path):
        from anno_spark.eval.dataset_provider import spark_dataset_provider

        d = tmp_path / "conll"
        d.mkdir()
        (d / "a.txt").write_text("Paris B-LOC\nis O\nnice O\n\n")
        provider = spark_dataset_provider(spark, {"conll2003": str(d)})
        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_datasets(["conll2003"])
            .with_backends(["stacked"])
            .with_dataset_provider(provider)
            .run(spark)
        )
        assert results.standard is not None
        assert results.standard.per_dataset["conll2003"].num_examples == 1


class TestRealCorpus:
    """The reference's checked-in RAW web/news corpus
    (hack/real_data/combined — demo inputs, no gold) through the full
    distributed extraction + cross-document coalescing path."""

    def test_raw_corpus_extraction_and_cdcr(self, spark):
        import os

        import pytest

        from anno_spark.eval.cdcr_data import CDCRConfig, CDCRResolver, Document, Entity
        from anno_spark.eval.dataset_provider import RAW_CORPUS_ROOT, raw_corpus_texts

        if not os.path.isdir(RAW_CORPUS_ROOT):
            pytest.skip(
                "raw sample corpus absent — set ANNO_SPARK_RAW_CORPUS_ROOT"
            )
        from anno_spark.operators.extract import extract_documents, mentions_table

        texts = raw_corpus_texts("combined")
        assert len(texts) >= 10, "reference sample corpus should be present"

        df = spark.createDataFrame(texts, "url string, text string")
        rows = (
            mentions_table(extract_documents(df))
            .select("url", "mention_idx", "text", "entity_type", "start",
                    "end", "confidence")
            .collect()
        )
        assert len(rows) > 50  # real news text yields real mention mass

        by_doc: dict = {doc_id: [] for doc_id, _ in texts}
        for r in rows:
            by_doc[r["url"]].append(
                (r["mention_idx"],
                 Entity(r["text"], r["entity_type"], r["start"], r["end"],
                        r["confidence"])))
        docs = [
            Document(doc_id, text,
                     [e for _, e in sorted(by_doc[doc_id], key=lambda t: t[0])])
            for doc_id, text in texts
        ]
        clusters = CDCRResolver.with_config(
            CDCRConfig(min_similarity=0.6, require_type_match=True, use_lsh=False)
        ).resolve(docs)

        # known cross-document entities in the reference corpus
        nvidia = [c for c in clusters if c.canonical_name.lower() == "nvidia"]
        assert nvidia and nvidia[0].doc_count() >= 2
        # the corpus's pervasive subject ("AI" across the news slice)
        assert max(c.doc_count() for c in clusters) >= 3

    @pytest.mark.slow
    def test_full_run_with_bias(self, spark):
        results = (
            EvalSystem.new()
            .with_tasks(["ner"])
            .with_backends(["stacked"])
            .with_max_examples(5)
            .with_bias_analysis(True)
            .run(spark)
        )
        b = results.bias
        assert b is not None
        assert b.gender is not None and 0.0 <= b.gender.bias_gap <= 1.0
        assert b.demographic is not None
        assert 0.0 <= b.demographic.overall_recognition_rate <= 1.0
        assert b.temporal is not None
        assert b.length is not None
        assert 0.0 <= b.length.short_entity_f1 <= 1.0

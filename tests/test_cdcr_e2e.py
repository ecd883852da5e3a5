"""CDCR end-to-end tests over the reference sample corpora.

Transcribed from /root/reference/tests/crossdoc_cli_e2e.rs:1-371 against
anno_spark.eval.cdcr_data (the CLI crossdoc engine).  One documented
divergence: cluster ids/enumeration are deterministic here (smallest
member index) where the reference iterates a HashMap — none of the
transcribed assertions depend on enumeration order.
"""

from __future__ import annotations

import time

from anno_spark.eval.cdcr_data import (
    CDCRConfig,
    CDCRMetrics,
    CDCRResolver,
    Document,
    Entity,
    comprehensive_cdcr_dataset,
    financial_news_dataset,
    political_news_dataset,
    science_news_dataset,
    sports_news_dataset,
    tech_news_dataset,
)


def _resolve(docs, min_similarity=0.4, use_lsh=False, require_type_match=True):
    config = CDCRConfig(
        min_similarity=min_similarity,
        use_lsh=use_lsh,
        require_type_match=require_type_match,
    )
    return CDCRResolver.with_config(config).resolve(docs)


class TestTechNewsE2E:
    def test_cdcr_with_tech_news_dataset(self):
        # crossdoc_cli_e2e.rs:7-48
        docs = tech_news_dataset()
        assert len(docs) >= 5
        clusters = _resolve(docs)
        assert clusters, "Should produce clusters from tech news dataset"
        cross_doc = [c for c in clusters if c.doc_count() > 1]
        assert cross_doc, "Should have cross-document clusters"

        nvidia = next(
            (c for c in clusters
             if c.canonical_name.lower() == "nvidia" and c.entity_type == "ORG"),
            None,
        )
        assert nvidia is not None
        assert nvidia.doc_count() >= 2

    def test_cdcr_cluster_quality_metrics(self):
        # crossdoc_cli_e2e.rs:50-94
        docs = tech_news_dataset()
        clusters = _resolve(docs)
        total_mentions = sum(len(c) for c in clusters)
        total_entities = sum(len(d.entities) for d in docs)
        assert total_mentions == total_entities, "All entities assigned to clusters"
        if clusters:
            avg = total_mentions / len(clusters)
            assert 1.0 <= avg <= total_entities
        for c in clusters:
            if c.doc_count() > 1:
                assert c.confidence <= 1.0

    def test_cdcr_document_coverage(self):
        # crossdoc_cli_e2e.rs:96-129
        docs = tech_news_dataset()
        clusters = _resolve(docs)
        docs_in_clusters = {d for c in clusters for d in c.documents}
        for d in docs:
            if d.entities:
                assert d.id in docs_in_clusters

    def test_cdcr_mention_consistency(self):
        # crossdoc_cli_e2e.rs:131-184
        docs = tech_news_dataset()
        doc_by_id = {d.id: d for d in docs}
        clusters = _resolve(docs)
        for c in clusters:
            for doc_id, entity_idx in c.mentions:
                assert doc_id in doc_by_id
                d = doc_by_id[doc_id]
                assert entity_idx < len(d.entities)
                if c.entity_type is not None:
                    assert d.entities[entity_idx].entity_type == c.entity_type
            assert {m[0] for m in c.mentions} == set(c.documents)

    def test_cdcr_canonical_name_quality(self):
        # crossdoc_cli_e2e.rs:186-236
        docs = tech_news_dataset()
        doc_by_id = {d.id: d for d in docs}
        clusters = _resolve(docs)
        for c in clusters:
            assert c.canonical_name
            assert len(c.canonical_name) <= 200
            canonical_lower = c.canonical_name.lower()
            assert any(
                doc_by_id[doc_id].entities[idx].text.lower() == canonical_lower
                for doc_id, idx in c.mentions
                if idx < len(doc_by_id[doc_id].entities)
            ), f"Canonical name '{c.canonical_name}' should match a mention"

    def test_cdcr_large_dataset_performance(self):
        # crossdoc_cli_e2e.rs:238-286 — doubled corpus through LSH < 1s
        docs = tech_news_dataset()
        copies = tech_news_dataset()
        for idx, d in enumerate(copies):
            d.id = f"doc{idx}_copy"
        docs.extend(copies)

        start = time.perf_counter()
        clusters = _resolve(docs, use_lsh=True)
        duration = time.perf_counter() - start
        assert duration < 1.0, f"CDCR should be fast, took {duration:.2f}s"
        assert clusters
        for c in clusters:
            assert c.mentions
            assert c.documents

    def test_cdcr_similarity_threshold_effect(self):
        # crossdoc_cli_e2e.rs:288-318 — lower threshold merges more
        docs = tech_news_dataset()
        high = _resolve(docs, min_similarity=0.8)
        low = _resolve(docs, min_similarity=0.2)
        assert len(low) <= len(high)

    def test_cdcr_type_matching_effect(self):
        # crossdoc_cli_e2e.rs:320-370 — Apple Inc. (ORG) vs apple (Fruit)
        doc1 = Document("doc1", "Apple Inc. announced new products.",
                        [Entity("Apple Inc.", "ORG", 0, 10, 0.9)])
        doc2 = Document("doc2", "I ate an apple for lunch.",
                        [Entity("apple", "Fruit", 9, 14, 0.8)])

        strict = _resolve([doc1, doc2], min_similarity=0.3, require_type_match=True)
        loose = _resolve([doc1, doc2], min_similarity=0.3, require_type_match=False)
        assert len(strict) == 2, "Type matching should prevent clustering"
        assert len(loose) <= 2


class TestOtherCorpora:
    """Smoke coverage over the remaining transcribed corpora
    (cdcr.rs:770-1050), mirroring the reference's in-module tests."""

    def test_political_biden_cross_doc(self):
        clusters = _resolve(political_news_dataset())
        biden = [c for c in clusters if "biden" in c.canonical_name.lower()]
        assert biden and max(c.doc_count() for c in biden) >= 2

    def test_sports_messi_cross_doc(self):
        clusters = _resolve(sports_news_dataset())
        messi = [c for c in clusters if "messi" in c.canonical_name.lower()]
        assert messi and max(c.doc_count() for c in messi) >= 2

    def test_financial_apple_cross_doc(self):
        clusters = _resolve(financial_news_dataset())
        apple = [c for c in clusters if c.canonical_name.lower() == "apple"]
        assert apple and apple[0].doc_count() >= 2

    def test_science_nasa_cross_doc(self):
        clusters = _resolve(science_news_dataset())
        nasa = [c for c in clusters if c.canonical_name == "NASA"]
        assert nasa and nasa[0].doc_count() >= 2

    def test_comprehensive_dataset_counts(self):
        docs = comprehensive_cdcr_dataset()
        assert len(docs) == 21  # 5 + 4 + 4 + 4 + 4
        clusters = _resolve(docs, use_lsh=True)
        total_mentions = sum(len(c) for c in clusters)
        assert total_mentions == sum(len(d.entities) for d in docs)


class TestCDCRMetrics:
    """cdcr.rs:585-668 B³ — perfect and degenerate cases."""

    def test_perfect_prediction(self):
        docs = tech_news_dataset()
        clusters = _resolve(docs)
        m = CDCRMetrics.compute(clusters, clusters)
        assert m.b_cubed_precision == 1.0
        assert m.b_cubed_recall == 1.0
        assert m.b_cubed_f1 == 1.0

    def test_empty(self):
        m = CDCRMetrics.compute([], [])
        assert m.b_cubed_f1 == 0.0
        assert m.num_pred_clusters == 0

    def test_split_cluster_recall_drop(self):
        from anno_spark.eval.cdcr_data import CrossDocCluster

        gold = CrossDocCluster(0, "A")
        gold.add_mention("d1", 0)
        gold.add_mention("d2", 0)
        p1 = CrossDocCluster(0, "A")
        p1.add_mention("d1", 0)
        p2 = CrossDocCluster(1, "A")
        p2.add_mention("d2", 0)
        m = CDCRMetrics.compute([p1, p2], [gold])
        assert m.b_cubed_precision == 1.0
        assert m.b_cubed_recall == 0.5

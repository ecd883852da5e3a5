"""Edge-case benchmark generator: sizing semantics, transcription
integrity, and the distributed per-family scoreboard.

Reference cases: anno/src/eval/benchmark.rs:817-897 tests.
"""

from __future__ import annotations

import pytest

from anno_spark.eval import benchmark as B
from anno_spark.eval.benchmark_data import TEMPLATES


def test_generate_large_dataset_all():
    ds = B.generate_large_dataset(100, "all")
    assert len(ds) >= 100  # reference floor (benchmark.rs:822-827)
    families = {e[4] for e in ds}
    assert families == set(TEMPLATES)


def test_single_family_floors_at_template_count():
    # asking for 1 still returns every template (max(count, len) quirk)
    n_templates = len(TEMPLATES["ambiguous"][0])
    ds = B.generate_large_dataset(1, "ambiguous")
    assert len(ds) == n_templates
    ds2 = B.generate_large_dataset(n_templates * 3, "ambiguous")
    assert len(ds2) == n_templates * 3
    assert ds2[0][0] == ds2[n_templates][0]  # cycling


def test_unknown_family_raises():
    with pytest.raises(ValueError):
        B.generate_large_dataset(10, "nonexistent")


def test_offsets_locate_their_text():
    for fam, (templates, _d, _df) in TEMPLATES.items():
        for text, ents in templates:
            for (etext, ety, start) in ents:
                assert text[start:start + len(etext)] == etext, (fam, etext)


def test_negative_templates_exist():
    # the ambiguous family's point: entity-free texts with trap surfaces
    templates, _, _ = TEMPLATES["ambiguous"]
    assert any(not ents for (_, ents) in templates)
    assert any(ents for (_, ents) in templates)


def test_benchmark_stats():
    ds = B.generate_large_dataset(50, "ambiguous")
    stats = B.benchmark_stats(ds)
    assert stats["total_examples"] == len(ds)
    assert stats["examples_with_no_entities"] > 0
    assert stats["avg_entities_per_example"] == pytest.approx(
        stats["total_entities"] / stats["total_examples"])


def test_edge_case_scores_distributed(spark):
    from anno_spark.core.document import extract_document

    out = B.edge_case_scores(
        spark, lambda t: extract_document(t).mentions, 100)
    rows = {r["family"]: r for r in out.collect()}
    assert set(rows) == set(TEMPLATES)
    for fam, r in rows.items():
        assert r.n_examples >= 10
        assert 0.0 <= r.f1 <= 1.0
    # ambiguous family must register false positives (trap surfaces)
    assert rows["ambiguous"].fp > 0

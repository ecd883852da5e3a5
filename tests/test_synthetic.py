"""Synthetic NER corpus: transcription integrity + reference-test
parity + the distributed backend evaluation path.

Reference assertions from anno/src/eval/synthetic.rs:169-216 and
anno/src/eval/dataset/synthetic/mod.rs.
"""

from __future__ import annotations

import pytest

from anno_spark.eval import synthetic as S


def test_all_datasets_size():
    allx = S.all_datasets()
    assert len(allx) >= 100  # reference floor (synthetic.rs:175-180)
    assert len(allx) == 170  # transcription exact count


def test_conll_alias():
    assert S.conll_style_dataset() == S.dataset("news")


def test_by_domain_and_difficulty():
    news = S.datasets_by_domain("News")
    assert news
    assert all(ex[2] == "News" for ex in news)
    hard = S.datasets_by_difficulty("Hard")
    assert all(ex[3] == "Hard" for ex in hard)


def test_dataset_stats():
    stats = S.dataset_stats()
    assert stats["total_examples"] == 170
    assert stats["total_entities"] > 0
    assert stats["domains"]
    assert stats["difficulties"]
    assert sum(stats["domains"].values()) == 170


def test_extended_quality_dataset():
    ext = S.extended_quality_dataset()
    assert ext
    assert len(ext) == (len(S.dataset("hard_domain_examples"))
                        + len(S.dataset("globally_diverse"))
                        + len(S.dataset("adversarial")))


def test_every_offset_locates_its_text():
    # transcription integrity: all 400+ annotations index their surface
    # exactly (char offsets — the reference authors chars, SURVEY T4)
    checked = 0
    for ex in S.all_datasets():
        text, ents, _, _ = ex
        for (etext, etype, start) in ents:
            assert text[start:start + len(etext)] == etext, (text, etext)
            checked += 1
    assert checked >= 400


def test_known_example_transcribed():
    # spot-check one hand-verified example (news.rs:10-15)
    news = S.dataset("news")
    assert news[0][0] == "Microsoft Corp. reported strong quarterly earnings."
    assert news[0][1] == [("Microsoft Corp.", "ORG", 0)]
    assert news[0][2:] == ("News", "Easy")


def test_multilingual_char_offsets():
    # CJK example proves char (not byte) indexing survived transcription
    ml = S.dataset("multilingual")
    for text, ents, _, _ in ml:
        for (etext, _, start) in ents:
            assert text[start:start + len(etext)] == etext


def test_examples_df(spark):
    corpus, gold = S.examples_df(spark)
    assert corpus.count() == 170
    assert gold.count() == S.dataset_stats()["total_entities"]
    assert set(gold.columns) == {"example_id", "text", "entity_type",
                                 "start", "end"}


def test_evaluate_extraction_backend(spark):
    # the engine's real stacked extractor over the corpus, scored by the
    # four-mode evaluator; sanity: mode leniency ordering holds and the
    # stack finds a nonzero share of gold on the easy news slice
    from anno_spark.core.document import extract_document

    def extract(text):
        return extract_document(text).mentions

    out = {r["mode"]: r for r in
           S.evaluate_backend_df(spark, extract,
                                 S.dataset("news")).collect()}
    assert set(out) == set(["strict", "exact", "partial", "type"])
    assert out["partial"].recall >= out["strict"].recall
    assert out["type"].recall >= out["strict"].recall
    assert out["partial"].recall > 0.0

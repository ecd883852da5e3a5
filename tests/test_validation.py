"""Ground-truth validation — reference tests transcribed
(anno/src/eval/validation.rs:196-257) plus the distributed pass and the
corpora-integrity tie-in."""

from __future__ import annotations

import pytest

from anno_spark.eval import validation as V


def test_validate_bounds_ok():
    r = V.validate_ground_truth_entities(
        "Hello world", [("Hello", "PER", 0, 5)])
    assert r.is_valid
    assert not r.errors


def test_validate_out_of_bounds():
    r = V.validate_ground_truth_entities("Hello", [("world", "PER", 10, 15)])
    assert not r.is_valid
    assert "out of bounds" in r.errors[0]
    with pytest.raises(ValueError):
        r.raise_if_invalid()


def test_validate_end_out_of_bounds_and_empty_span():
    r = V.validate_ground_truth_entities("Hello", [("lo", "PER", 3, 9)])
    assert not r.is_valid
    r2 = V.validate_ground_truth_entities("Hello", [("", "PER", 2, 2)])
    assert not r2.is_valid
    assert any("invalid span" in e for e in r2.errors)
    assert any("whitespace-only" in w for w in r2.warnings)


def test_text_mismatch_is_warning_not_error():
    r = V.validate_ground_truth_entities(
        "Hello world", [("Howdy", "PER", 0, 5)])
    assert r.is_valid  # mismatch tolerated (the pinned-quirk mechanism)
    assert any("text mismatch" in w for w in r.warnings)


def test_validate_overlapping_strict_vs_lenient():
    ents = [("Hello", "PER", 0, 5), ("lo wo", "PER", 3, 8)]
    lenient = V.validate_ground_truth_entities("Hello world", ents, False)
    assert lenient.is_valid
    assert lenient.warnings
    strict = V.validate_ground_truth_entities("Hello world", ents, True)
    assert not strict.is_valid


def test_type_consistency():
    cases = [("a", [("x", "PER", 0, 1)]), ("b", [("y", "Per", 0, 1)])]
    r = V.validate_entity_type_consistency(cases)
    assert r.is_valid  # warnings only
    assert any("inconsistent" in w for w in r.warnings)
    clean = V.validate_entity_type_consistency(
        [("a", [("x", "PER", 0, 1)]), ("b", [("y", "PER", 0, 1)])])
    assert not clean.warnings


def test_synthetic_corpus_validates_clean():
    # the transcribed NER corpus must pass validation with zero errors
    # (its offsets verified at transcription); overlap warnings allowed
    from anno_spark.eval import synthetic as S

    for (text, ents, _d, _f) in S.all_datasets():
        if not text:
            continue
        r = V.validate_ground_truth_entities(
            text, [(t, ty, s, s + len(t)) for (t, ty, s) in ents])
        assert r.is_valid, (text, r.errors)
        assert not any("text mismatch" in w for w in r.warnings), text


def test_validate_gold_df(spark):
    docs = spark.createDataFrame(
        [("d1", "Hello world"), ("d2", "Short")],
        "url string, text string")
    gold = spark.createDataFrame(
        [("d1", "Hello", "PER", 0, 5),
         ("d1", "lo wo", "PER", 3, 8),     # overlap -> warning
         ("d2", "missing", "ORG", 10, 17)],  # out of bounds -> error
        "url string, text string, entity_type string, start long, end long")
    rows = V.validate_gold_df(docs, gold).collect()
    kinds = {(r.doc_id, r.kind) for r in rows}
    assert ("d2", "error") in kinds
    assert ("d1", "warning") in kinds
    assert not any(r.doc_id == "d1" and r.kind == "error" for r in rows)

"""BIO adapter + SemEval eval modes: reference-test transcription and a
Spark distributional check.

BIO cases come from anno/src/eval/bio_adapter.rs:676-993; mode cases
from anno/src/eval/modes.rs:660-893.
"""

from __future__ import annotations

import pytest

from anno_spark.core import bio
from anno_spark.eval import modes as M


# ---------------------------------------------------------------------------
# bio_to_entities (reference tests transcribed)


def test_iob2_basic():
    ents = bio.bio_to_entities(["John", "Smith", "works", "at", "Apple"],
                               ["B-PER", "I-PER", "O", "O", "B-ORG"])
    assert [(e.text, e.entity_type) for e in ents] == [
        ("John Smith", "PER"), ("Apple", "ORG")]


def test_iob2_adjacent_same_type():
    ents = bio.bio_to_entities(["John", "and", "Mary"],
                               ["B-PER", "O", "B-PER"])
    assert [e.text for e in ents] == ["John", "Mary"]


def test_iob2_multi_token_org():
    ents = bio.bio_to_entities(
        ["United", "Nations", "Security", "Council", "met"],
        ["B-ORG", "I-ORG", "I-ORG", "I-ORG", "O"])
    assert len(ents) == 1
    assert ents[0].text == "United Nations Security Council"
    assert ents[0].entity_type == "ORG"


def test_iobes_single_token():
    ents = bio.bio_to_entities(["John", "works", "here"],
                               ["S-PER", "O", "O"], "IOBES")
    assert [e.text for e in ents] == ["John"]


def test_iobes_bie_sequence():
    ents = bio.bio_to_entities(["New", "York", "City"],
                               ["B-LOC", "I-LOC", "E-LOC"], "IOBES")
    assert [e.text for e in ents] == ["New York City"]


def test_iob1_scheme():
    ents = bio.bio_to_entities(["John", "Mary", "works"],
                               ["I-PER", "I-PER", "O"], "IOB1")
    assert [e.text for e in ents] == ["John Mary"]


def test_ioe2_basic():
    ents = bio.bio_to_entities(["New", "York", "City"],
                               ["I-LOC", "I-LOC", "E-LOC"], "IOE2")
    assert [e.text for e in ents] == ["New York City"]
    assert ents[0].entity_type == "LOC"


def test_ioe2_multiple_entities():
    ents = bio.bio_to_entities(["John", "works", "at", "Apple", "Inc"],
                               ["E-PER", "O", "O", "I-ORG", "E-ORG"], "IOE2")
    assert [e.text for e in ents] == ["John", "Apple Inc"]


def test_ioe1_basic():
    ents = bio.bio_to_entities(["New", "York"], ["I-LOC", "I-LOC"], "IOE1")
    assert [e.text for e in ents] == ["New York"]


def test_character_offsets():
    ents = bio.bio_to_entities(["John", "Smith"], ["B-PER", "I-PER"])
    assert ents[0].start == 0
    assert ents[0].end == 10  # "John" (4) + space + "Smith" (5)


def test_empty_and_all_outside():
    assert bio.bio_to_entities([], []) == []
    assert bio.bio_to_entities(["The", "cat", "sat"], ["O", "O", "O"]) == []


def test_mismatched_lengths():
    with pytest.raises(ValueError):
        bio.bio_to_entities(["John", "Smith"], ["B-PER"])


def test_custom_entity_types():
    ents = bio.bio_to_entities(["CRISPR", "is", "a", "technology"],
                               ["B-TECH", "O", "O", "O"])
    assert len(ents) == 1
    assert ents[0].entity_type == "TECH"  # custom label kept


def test_orphan_inside_is_lenient():
    # I without B starts a new entity in IOB2 decoding (rs:210-214)
    ents = bio.bio_to_entities(["John", "Smith"], ["I-PER", "I-PER"])
    assert [e.text for e in ents] == ["John Smith"]


# ---------------------------------------------------------------------------
# entities_to_bio + roundtrip


def test_roundtrip_iob2():
    tokens = ["John", "Smith", "works", "at", "Apple"]
    tags = ["B-PER", "I-PER", "O", "O", "B-ORG"]
    ents = bio.bio_to_entities(tokens, tags)
    offsets = []
    cur = 0
    for t in tokens:
        offsets.append((cur, cur + len(t)))
        cur += len(t) + 1
    assert bio.entities_to_bio(offsets, ents) == tags


def test_entities_to_bio_ioe2():
    from anno_spark.core.entity import Mention
    ents = [Mention("Big Apple", "LOC", 4, 14, 0.9, "t", "t")]
    tags = bio.entities_to_bio([(0, 3), (4, 7), (8, 13)], ents, "IOE2")
    assert tags == ["O", "I-LOC", "E-LOC"]


def test_entities_to_bio_iobes_single():
    from anno_spark.core.entity import Mention
    ents = [Mention("Apple", "ORG", 4, 9, 1.0, "t", "t")]
    tags = bio.entities_to_bio([(0, 3), (4, 9)], ents, "IOBES")
    assert tags == ["O", "S-ORG"]


# ---------------------------------------------------------------------------
# validate + repair


def test_validation_iob2():
    errors = bio.validate_bio_sequence(["O", "I-PER", "I-PER"])
    assert errors and "follows O" in errors[0]
    assert bio.validate_bio_sequence(["B-PER", "I-PER", "O"]) == []


def test_validation_type_mismatch():
    errors = bio.validate_bio_sequence(["B-PER", "I-LOC"])
    assert errors and "type mismatch" in errors[0]


def test_repair_promote_to_begin():
    assert bio.repair_bio_sequence(["O", "I-PER", "I-PER", "O"]) == \
        ["O", "B-PER", "I-PER", "O"]


def test_repair_discard():
    assert bio.repair_bio_sequence(["O", "I-PER", "I-PER", "O"],
                                   strategy="discard") == ["O", "O", "O", "O"]


def test_repair_lenient():
    assert bio.repair_bio_sequence(["O", "I-PER", "I-PER", "O"],
                                   strategy="lenient") == \
        ["O", "I-PER", "I-PER", "O"]


def test_repair_type_change():
    assert bio.repair_bio_sequence(["B-PER", "I-LOC", "O"]) == \
        ["B-PER", "B-LOC", "O"]


def test_repair_iobes_orphans_become_single():
    assert bio.repair_bio_sequence(["O", "I-PER", "O"], "IOBES") == \
        ["O", "S-PER", "O"]
    assert bio.repair_bio_sequence(["O", "E-PER", "O"], "IOBES") == \
        ["O", "S-PER", "O"]


# ---------------------------------------------------------------------------
# eval modes (modes.rs tests transcribed; spans as (start, end, type))


def test_strict_exact_match():
    r = M.evaluate_with_mode([(0, 4, "PER")], [(0, 4, "PER")], "strict")
    assert r.f1 == pytest.approx(1.0)


def test_strict_wrong_boundary_partial_credits():
    pred, gold = [(0, 10, "PER")], [(0, 4, "PER")]
    assert M.evaluate_with_mode(pred, gold, "strict").f1 == 0.0
    assert M.evaluate_with_mode(pred, gold, "partial").f1 == pytest.approx(1.0)


def test_strict_wrong_type_exact_credits():
    pred, gold = [(0, 5, "ORG")], [(0, 5, "LOC")]
    assert M.evaluate_with_mode(pred, gold, "strict").f1 == 0.0
    assert M.evaluate_with_mode(pred, gold, "exact").f1 == pytest.approx(1.0)


def test_no_overlap_fails_all_modes():
    pred, gold = [(0, 4, "PER")], [(10, 14, "PER")]
    for mode in M.EVAL_MODES:
        assert M.evaluate_with_mode(pred, gold, mode).f1 == 0.0


def test_multi_mode_results():
    pred = [(0, 4, "PER"), (10, 23, "LOC")]
    gold = [(0, 4, "PER"), (10, 18, "LOC")]
    all_modes = M.multi_mode_results(pred, gold)
    assert all_modes["strict"].precision == pytest.approx(0.5)
    assert all_modes["partial"].f1 == pytest.approx(1.0)


def test_overlap_ratio():
    assert M.overlap_ratio(0, 10, 0, 10) == pytest.approx(1.0)
    assert M.overlap_ratio(0, 5, 10, 15) == 0.0
    assert M.overlap_ratio(0, 10, 5, 15) == pytest.approx(5.0 / 15.0)


def test_empty_inputs():
    r = M.evaluate_with_mode([], [], "strict")
    assert (r.f1, r.true_positives, r.false_positives, r.false_negatives) == \
        (0.0, 0, 0, 0)


def test_config_clamp():
    assert M.EvalConfig(1.5).min_overlap == 1.0
    assert M.EvalConfig(-0.5).min_overlap == 0.0


def test_partial_overlap_threshold():
    pred, gold = [(0, 13, "LOC")], [(0, 8, "LOC")]
    # IoU = 8/13 ≈ 0.615
    assert M.evaluate_with_mode(pred, gold, "partial",
                                M.EvalConfig(0.0)).f1 == pytest.approx(1.0)
    assert M.evaluate_with_mode(pred, gold, "partial",
                                M.EvalConfig(0.5)).f1 == pytest.approx(1.0)
    assert M.evaluate_with_mode(pred, gold, "partial",
                                M.EvalConfig(0.7)).f1 == 0.0


def test_greedy_first_match_order_dependence():
    # two predictions overlap one gold: the first claims it, the second
    # becomes FP (reference greedy walk, modes.rs:490-524)
    pred = [(0, 4, "PER"), (0, 4, "PER")]
    gold = [(0, 4, "PER")]
    r = M.evaluate_with_mode(pred, gold, "strict")
    assert (r.true_positives, r.false_positives, r.false_negatives) == (1, 1, 0)


# ---------------------------------------------------------------------------
# distributed


def test_multi_mode_df_matches_local(spark):
    pred_rows = [
        ("u1", 0, 4, "PER"), ("u1", 10, 23, "LOC"), ("u2", 0, 5, "ORG"),
        ("u3", 7, 9, "PER"),
    ]
    gold_rows = [
        ("u1", 0, 4, "PER"), ("u1", 10, 18, "LOC"), ("u2", 0, 5, "LOC"),
        ("u4", 2, 6, "ORG"),
    ]
    pred = spark.createDataFrame(pred_rows, "url string, start long, end long, entity_type string")
    gold = spark.createDataFrame(gold_rows, "url string, start long, end long, entity_type string")
    got = {r["mode"]: r for r in M.multi_mode_df(pred, gold).collect()}

    # local oracle: group by url, sum counts
    from collections import defaultdict
    by_doc_p, by_doc_g = defaultdict(list), defaultdict(list)
    for u, s, e, t in pred_rows:
        by_doc_p[u].append((s, e, t))
    for u, s, e, t in gold_rows:
        by_doc_g[u].append((s, e, t))
    for mode in M.EVAL_MODES:
        tp = fp = fn = 0
        for u in set(by_doc_p) | set(by_doc_g):
            a, b, c = M.count_matches(sorted(by_doc_p[u]), sorted(by_doc_g[u]),
                                      mode)
            tp, fp, fn = tp + a, fp + b, fn + c
        row = got[mode]
        assert (row.tp, row.fp, row.fn) == (tp, fp, fn), mode
        p, r, f1 = M._prf(tp, fp, fn)
        assert row.precision == pytest.approx(p)
        assert row.f1 == pytest.approx(f1)


def test_type_mode_threshold_quirk():
    # the reference's config path applies min_overlap to TYPE mode too
    # (modes.rs:640-651) despite describing it as "any overlap" — pinned
    pred, gold = [(0, 10, "PER")], [(9, 20, "PER")]  # IoU = 1/20
    assert M.evaluate_with_mode(pred, gold, "type",
                                M.EvalConfig(0.0)).f1 == pytest.approx(1.0)
    assert M.evaluate_with_mode(pred, gold, "type",
                                M.EvalConfig(0.5)).f1 == 0.0


def test_zero_width_span_overlap_quirk():
    # the union==0 branch is dead code in the reference too: identical
    # zero-width spans score 0.0 via the early return
    assert M.overlap_ratio(5, 5, 5, 5) == 0.0

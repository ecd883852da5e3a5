"""Property-based tests for the round-4 modules (hypothesis), extending
tests/test_properties.py in the reference's proptest style (SURVEY §5
#3): never-panic, bounds discipline, and algebraic invariants.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anno_spark.core import bio
from anno_spark.core import boxes as B
from anno_spark.eval import evaluator as EV
from anno_spark.eval import modes as M

# ---------------------------------------------------------------------------
# strategies

_types = st.sampled_from(["PER", "ORG", "LOC", "DATE"])


@st.composite
def _nonoverlapping_entities(draw):
    """Sorted, disjoint (text, type, start, end) spans over token slots."""
    n_tokens = draw(st.integers(1, 12))
    tokens = [draw(st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu")),
        min_size=1, max_size=6)) for _ in range(n_tokens)]
    offsets = []
    cur = 0
    for t in tokens:
        offsets.append((cur, cur + len(t)))
        cur += len(t) + 1
    # pick disjoint token runs
    ents = []
    i = 0
    while i < n_tokens:
        if draw(st.booleans()):
            j = min(i + draw(st.integers(0, 2)), n_tokens - 1)
            ents.append((i, j, draw(_types)))
            i = j + 2  # gap guarantees B- restart in IOB2
        else:
            i += 1
    return tokens, offsets, ents


@st.composite
def _box_pair(draw):
    dim = draw(st.integers(1, 4))
    f = st.floats(-5, 5, allow_nan=False)
    w = st.floats(0.01, 3, allow_nan=False)
    mins, maxs = [], []
    for _ in range(2):
        mn = np.array([draw(f) for _ in range(dim)], np.float32)
        width = np.array([draw(w) for _ in range(dim)], np.float32)
        mins.append(mn)
        maxs.append(mn + width)
    return mins[0], maxs[0], mins[1], maxs[1]


# ---------------------------------------------------------------------------
# BIO adapter


@settings(max_examples=80, deadline=None)
@given(_nonoverlapping_entities())
def test_bio_roundtrip_all_schemes(data):
    tokens, offsets, runs = data
    from anno_spark.core.entity import Mention

    ents = [Mention(" ".join(tokens[i:j + 1]), ty,
                    offsets[i][0], offsets[j][1], 1.0, "t", "t")
            for (i, j, ty) in runs]
    for scheme in bio.SCHEMES:
        tags = bio.entities_to_bio(offsets, ents, scheme)
        assert len(tags) == len(tokens)
        decoded = bio.bio_to_entities(tokens, tags, scheme)
        got = [(e.start, e.end, e.entity_type) for e in decoded]
        want = [(offsets[i][0], offsets[j][1], ty) for (i, j, ty) in runs]
        assert got == want, (scheme, tags)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(
    ["O", "B-PER", "I-PER", "I-ORG", "E-PER", "S-LOC", "garbage", "B_ORG"]),
    max_size=12))
def test_bio_repair_fixes_validation(tags):
    # repaired IOB2 sequences must validate clean; decode never raises
    repaired = bio.repair_bio_sequence(tags, "IOB2", "promote")
    assert bio.validate_bio_sequence(repaired, "IOB2") == []
    bio.bio_to_entities(["w"] * len(tags), repaired, "IOB2")


# ---------------------------------------------------------------------------
# box geometry


@settings(max_examples=120, deadline=None)
@given(_box_pair())
def test_box_score_bounded_and_symmetric(pair):
    a_min, a_max, b_min, b_max = pair
    s_ab = float(B.coreference_score(a_min, a_max, b_min, b_max))
    s_ba = float(B.coreference_score(b_min, b_max, a_min, a_max))
    assert 0.0 <= s_ab <= 1.0 + 1e-6
    assert s_ab == pytest.approx(s_ba, rel=1e-5, abs=1e-7)
    # intersection never exceeds either volume
    iv = float(B.intersection_volume(a_min, a_max, b_min, b_max))
    assert iv <= float(B.volume(a_min, a_max)) * (1 + 1e-5) + 1e-7
    assert iv <= float(B.volume(b_min, b_max)) * (1 + 1e-5) + 1e-7


@settings(max_examples=80, deadline=None)
@given(_box_pair())
def test_containment_implies_full_conditional(pair):
    a_min, a_max, b_min, b_max = pair
    # shrink A into B to force containment
    center = (b_min + b_max) / 2
    half = (b_max - b_min) / 4
    a_min2, a_max2 = center - half, center + half
    assert bool(B.is_contained_in(a_min2, a_max2, b_min, b_max))
    p = float(B.conditional_probability(b_min, b_max, a_min2, a_max2))
    # P(B|A) = Vol(B∩A)/Vol(A) = 1 when A ⊆ B
    assert p == pytest.approx(1.0, rel=1e-4)


# ---------------------------------------------------------------------------
# eval modes + evaluator


@st.composite
def _span_sets(draw):
    spans = st.tuples(st.integers(0, 40), st.integers(1, 10), _types)
    mk = lambda: [(s, s + l, t) for (s, l, t) in
                  draw(st.lists(spans, max_size=6))]
    return mk(), mk()


@settings(max_examples=100, deadline=None)
@given(_span_sets())
def test_mode_dominance(data):
    pred, gold = data
    counts = {m: M.count_matches(pred, gold, m) for m in M.EVAL_MODES}
    tp = {m: c[0] for m, c in counts.items()}
    # strict is the intersection of exact-boundary and type matching:
    # its TP can never exceed either relaxation
    assert tp["strict"] <= tp["exact"]
    assert tp["strict"] <= tp["partial"]
    assert tp["partial"] == tp["type"]  # same predicate at min_overlap=0
    for m, (tp_, fp, fn) in counts.items():
        assert tp_ + fp == len(pred)
        assert tp_ + fn == len(gold)


@settings(max_examples=100, deadline=None)
@given(_span_sets())
def test_evaluator_bounds_and_conservation(data):
    pred, gold = data
    cm = EV.evaluate_test_case(pred, gold)
    assert 0.0 <= cm.precision <= 1.0
    assert 0.0 <= cm.recall <= 1.0
    assert 0.0 <= cm.f1 <= 1.0
    assert cm.correct <= min(cm.found, cm.expected)
    # per-type expected/found totals conserve the inputs
    assert sum(t.expected for t in cm.per_type.values()) == len(gold)
    assert sum(t.found for t in cm.per_type.values()) == len(pred)

"""Dataset-quality metrics (reference: anno/src/eval/dataset_quality.rs).

Transcribed reference tests (dataset_quality.rs:450-544), a
pure-python transcription differential over a mixed corpus, the
∞-imbalance and negative-null-rate quirks, and the grade/
recommendation deduction table.
"""

from __future__ import annotations

import math

import pytest

from anno_spark.eval.dataset_quality import (
    check_leakage,
    dataset_quality_report,
    entity_imbalance_ratio,
    grade_and_recommendations,
)

DOCS = "text string"
ENTS = "text string, entity_type string"


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _report(spark, train, test):
    """train/test: [(text, [(ent_text, ent_type)])] — the reference's
    input shape, flattened to the port's docs/ents frames."""
    def docs(data):
        return spark.createDataFrame([(t,) for t, _ in data] or [], DOCS)

    def ents(data):
        rows = [(e, ty) for _, es in data for e, ty in es]
        return spark.createDataFrame(rows or [], ENTS)

    summary, type_dist, ambiguous = dataset_quality_report(
        docs(train), ents(train), docs(test), ents(test)
    )
    return (
        summary.collect()[0],
        {r.entity_type: r["count"] for r in type_dist.collect()},
        {r.surface: list(r.labels) for r in ambiguous.collect()},
    )


# ------------------------------------------------------------ transcribed


def test_redundancy_detection(spark):
    # dataset_quality.rs:455-470
    train = [
        ("John works at Google.", [("John", "PER")]),
        ("John works at Google.", [("John", "PER")]),
        ("Jane joined Microsoft.", [("Jane", "PER")]),
    ]
    s, _, _ = _report(spark, train, [])
    assert s.duplicate_count == 1
    assert s.redundancy > 0.0
    assert s.redundancy == pytest.approx(1 / 3)


def test_leakage_detection(spark):
    # dataset_quality.rs:472-486
    train = [("John works at Google.", [("John", "PER")])]
    test = [
        ("John works at Google.", [("John", "PER")]),
        ("Jane joined Microsoft.", [("Jane", "PER")]),
    ]
    s, _, _ = _report(spark, train, test)
    assert s.leaked_count == 1
    assert s.leakage_ratio == pytest.approx(0.5)


def test_unseen_entity_ratio(spark):
    # dataset_quality.rs:488-505
    train = [("John works at Google.", [("John", "PER"), ("Google", "ORG")])]
    test = [("Jane joined Microsoft.", [("Jane", "PER"), ("Microsoft", "ORG")])]
    s, _, _ = _report(spark, train, test)
    assert s.unseen_entity_count == 2
    assert s.unseen_entity_ratio == pytest.approx(1.0)


def test_entity_ambiguity(spark):
    # dataset_quality.rs:507-520
    train = [
        ("Washington is a state.", [("Washington", "LOC")]),
        ("Washington was president.", [("Washington", "PER")]),
    ]
    s, _, ambiguous = _report(spark, train, [])
    assert s.entity_ambiguity > 0.0
    assert ambiguous == {"washington": ["LOC", "PER"]}


def test_entity_imbalance(spark):
    # dataset_quality.rs:522-534
    train = [
        ("Text 1", [("e1", "PER"), ("e2", "PER"), ("e3", "PER")]),
        ("Text 2", [("e4", "ORG")]),
    ]
    s, dist, _ = _report(spark, train, [])
    assert s.entity_imbalance == pytest.approx(3.0)
    assert dist == {"PER": 3, "ORG": 1}


def test_quick_leakage_check(spark):
    # dataset_quality.rs:536-543
    train = spark.createDataFrame([("text a",), ("text b",), ("text c",)], DOCS)
    test = spark.createDataFrame([("text a",), ("text d",)], DOCS)
    r = check_leakage(train, test).collect()[0]
    assert r.leaked_count == 1
    assert r.leakage_ratio == pytest.approx(0.5)


# ------------------------------------------------------------ quirks


def test_imbalance_infinity_on_no_entities(spark):
    """report path: no train entities → (0,0) → +∞
    (dataset_quality.rs:279-295); utility path: empty → 1.0
    (dataset_quality.rs:427-445)."""
    s, _, _ = _report(spark, [("just text", [])], [])
    assert math.isinf(s.entity_imbalance)
    util = entity_imbalance_ratio(
        spark.createDataFrame([], "entity_type string")
    ).collect()[0]
    assert util.imbalance == 1.0


def test_null_rate_can_go_negative(spark):
    """entity tokens are a rough double-counting estimate
    (dataset_quality.rs:297-320)."""
    train = [("one two", [("one two", "A"), ("one two", "B")])]
    s, _, _ = _report(spark, train, [])
    # 4 entity tokens over 2 text tokens → 1 - 2.0 = -1.0
    assert s.entity_null_rate == pytest.approx(-1.0)


def test_empty_everything(spark):
    s, dist, amb = _report(spark, [], [])
    assert s.redundancy == 0.0 and s.leakage_ratio == 0.0
    assert s.unseen_entity_ratio == 0.0 and s.entity_ambiguity == 0.0
    assert s.entity_density == 0.0
    assert s.entity_null_rate == 1.0
    assert s.avg_entities_per_sample == 0.0
    assert math.isinf(s.entity_imbalance)
    assert dist == {} and amb == {}


# -------------------------------------------------------- differential


def _py_analyze(train, test):
    """Literal transcription of analyze() (dataset_quality.rs:118-329)."""
    seen, dup = set(), 0
    for t, _ in train:
        lo = t.lower()
        if lo in seen:
            dup += 1
        seen.add(lo)
    redundancy = dup / len(train) if train else 0.0
    train_texts = {t.lower() for t, _ in train}
    leaked = sum(1 for t, _ in test if t.lower() in train_texts)
    leakage = leaked / len(test) if test else 0.0
    train_surf = {e.lower() for _, es in train for e, _ in es}
    test_occ = [(e, ty) for _, es in test for e, ty in es]
    unseen = sum(1 for e, _ in test_occ if e.lower() not in train_surf)
    unseen_ratio = unseen / len(test_occ) if test_occ else 0.0
    labels = {}
    for _, es in list(train) + list(test):
        for e, ty in es:
            labels.setdefault(e.lower(), set()).add(ty)
    amb = {k: sorted(v) for k, v in labels.items() if len(v) > 1}
    ambiguity = len(amb) / len(labels) if labels else 0.0
    tokens = sum(len(t.split()) for t, _ in train)
    n_ents = sum(len(es) for _, es in train)
    density = n_ents / tokens * 100.0 if tokens else 0.0
    counts = {}
    for _, es in train:
        for _, ty in es:
            counts[ty] = counts.get(ty, 0) + 1
    imb = (
        max(counts.values()) / min(counts.values())
        if counts and min(counts.values()) > 0
        else float("inf")
    )
    ent_tokens = sum(len(e.split()) for _, es in train for e, _ in es)
    null_rate = 1.0 - ent_tokens / tokens if tokens else 1.0
    avg = n_ents / len(train) if train else 0.0
    return dict(
        redundancy=redundancy, duplicate_count=dup, leakage_ratio=leakage,
        leaked_count=leaked, unseen_entity_ratio=unseen_ratio,
        unseen_entity_count=unseen, entity_ambiguity=ambiguity,
        ambiguous=amb, entity_density=density, entity_imbalance=imb,
        entity_null_rate=null_rate, avg_entities_per_sample=avg,
        type_distribution=counts,
    )


def test_differential_vs_transcription(spark):
    train = [
        ("John works at Google in  Mountain View.", [("John", "PER"), ("Google", "ORG"), ("Mountain View", "LOC")]),
        ("john works at google in  mountain view.", [("john", "PER"), ("google", "ORG")]),
        ("Amazon ships from Seattle.", [("Amazon", "ORG"), ("Seattle", "LOC")]),
        ("Washington signed the bill.", [("Washington", "PER")]),
        ("Visit Washington this summer.", [("Washington", "LOC")]),
        ("   ", []),
    ]
    test = [
        ("Amazon ships from Seattle.", [("Amazon", "ORG"), ("Seattle", "LOC")]),
        ("Tim Cook leads Apple.", [("Tim Cook", "PER"), ("Apple", "ORG")]),
        ("GOOGLE expanded again.", [("GOOGLE", "ORG")]),
    ]
    want = _py_analyze(train, test)
    s, dist, amb = _report(spark, train, test)
    for k in (
        "redundancy", "duplicate_count", "leakage_ratio", "leaked_count",
        "unseen_entity_ratio", "unseen_entity_count", "entity_ambiguity",
        "entity_density", "entity_imbalance", "entity_null_rate",
        "avg_entities_per_sample",
    ):
        assert s[k] == pytest.approx(want[k]), k
    assert dist == want["type_distribution"]
    assert amb == want["ambiguous"]


# ----------------------------------------------- grade & recommendations


def _row(**over):
    base = dict(
        redundancy=0.0, duplicate_count=0, leakage_ratio=0.0, leaked_count=0,
        unseen_entity_ratio=0.0, unseen_entity_count=0, entity_ambiguity=0.0,
        ambiguous_count=0, entity_density=5.0, entity_imbalance=1.0,
        entity_null_rate=0.8, avg_entities_per_sample=2.0, n_train=10, n_test=5,
    )
    base.update(over)
    return base


def test_grades_and_deductions():
    grade, issues = grade_and_recommendations(_row())
    assert grade == "A (Excellent)" and issues == []
    # leakage alone: -25 → 75 → C
    grade, issues = grade_and_recommendations(_row(leakage_ratio=0.2, leaked_count=3))
    assert grade == "C (Acceptable)"
    assert issues == [
        "Data leakage detected (20.0%): 3 test samples appear in training"
    ]
    # redundancy (-15) + leakage (-25) → 60 → D
    grade, _ = grade_and_recommendations(
        _row(redundancy=0.2, leakage_ratio=0.2, leaked_count=1)
    )
    assert grade == "D (Needs Improvement)"
    # everything wrong → 100-85=15 → F
    grade, issues = grade_and_recommendations(
        _row(
            redundancy=0.5, leakage_ratio=0.5, leaked_count=9,
            unseen_entity_ratio=0.9, entity_ambiguity=0.5,
            entity_imbalance=50.0, entity_null_rate=0.99,
        )
    )
    assert grade == "F (Critical Issues)"
    assert len(issues) == 6
    assert issues[4] == (
        "Severe class imbalance (50.0x): Consider oversampling rare entity types"
    )
    # boundary: exactly 90 → A; 89 unreachable by deductions but band-checked
    grade, _ = grade_and_recommendations(_row(unseen_entity_ratio=0.6))
    assert grade == "A (Excellent)"  # -10 → 90
    grade, _ = grade_and_recommendations(
        _row(unseen_entity_ratio=0.6, entity_ambiguity=0.2)
    )
    assert grade == "B (Good)"  # -20 → 80

"""Inter-document coreference clustering metrics (reference:
anno/src/eval/inter_doc_coref.rs).

Layers: the two transcribed reference tests (inter_doc_coref.rs:264-297);
hand-computed purity/completeness cases pinning the Σ-max reduction;
a pure-python transcription of InterDocCorefMetrics::compute as a
differential oracle over seeded random clusterings; edge cases the
reference math implies (one-sided tracks inflating num_total,
duplicate track rows collapsing).
"""

from __future__ import annotations

import random

import pytest

from anno_spark.eval.inter_doc_coref import inter_doc_coref_metrics

PRED_SCHEMA = "doc_id string, track_id long, identity_id long"
GOLD_SCHEMA = "doc_id string, track_id long, cluster_id long"


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _frames(spark, pred_rows, gold_rows):
    return (
        spark.createDataFrame(pred_rows, PRED_SCHEMA)
        if pred_rows
        else spark.createDataFrame([], PRED_SCHEMA),
        spark.createDataFrame(gold_rows, GOLD_SCHEMA)
        if gold_rows
        else spark.createDataFrame([], GOLD_SCHEMA),
    )


def _row(spark, pred_rows, gold_rows):
    p, g = _frames(spark, pred_rows, gold_rows)
    rows = inter_doc_coref_metrics(p, g).collect()
    assert len(rows) == 1
    return rows[0]


# ------------------------------------------------------------ transcribed


def test_empty_both_sides(spark):
    # inter_doc_coref.rs:292-297 — Default: everything zero.
    m = _row(spark, [], [])
    assert m.cluster_purity == 0.0
    assert m.cluster_completeness == 0.0
    assert m.f1 == 0.0
    assert m.num_pred_identities == 0
    assert m.num_gold_identities == 0
    assert m.num_correct == 0
    assert m.num_total == 0


def test_basic_corpus(spark):
    # inter_doc_coref.rs:183-289 — the 3-doc Apple/Microsoft corpus with
    # the resolver replaced by its expected output (Apple tracks cluster,
    # Microsoft tracks cluster): metrics in [0,1], and — stronger than
    # the reference's range assertion — exactly perfect.
    pred = [
        ("doc1", 0, 100),  # Apple
        ("doc2", 0, 100),  # Apple Inc
        ("doc1", 1, 200),  # Microsoft
        ("doc3", 0, 200),  # Microsoft Corp
    ]
    gold = [
        ("doc1", 0, 0),
        ("doc2", 0, 0),
        ("doc1", 1, 1),
        ("doc3", 0, 1),
    ]
    m = _row(spark, pred, gold)
    assert 0.0 <= m.cluster_purity <= 1.0
    assert 0.0 <= m.cluster_completeness <= 1.0
    assert 0.0 <= m.f1 <= 1.0
    assert m.cluster_purity == 1.0
    assert m.cluster_completeness == 1.0
    assert m.f1 == 1.0
    assert m.num_correct == 4
    assert m.num_total == 4
    assert m.num_pred_identities == 2
    assert m.num_gold_identities == 2


# ------------------------------------------------------------ hand-computed


def test_mixed_clustering(spark):
    # I1={t1,t2,t3}: t1,t2 in G1, t3 in G2 -> max 2. I2={t4}: t4 in G2
    # -> max 1. Purity numerator 3. G1={t1,t2}: max pred count 2 (I1).
    # G2={t3,t4,t5}: t3->I1, t4->I2, t5 unpredicted -> max 1.
    # Completeness numerator 3. num_total = |{t1..t5}| = 5.
    pred = [("d", 1, 10), ("d", 2, 10), ("d", 3, 10), ("d", 4, 20)]
    gold = [("d", 1, 0), ("d", 2, 0), ("d", 3, 1), ("d", 4, 1), ("d", 5, 1)]
    m = _row(spark, pred, gold)
    assert m.num_total == 5
    assert m.num_correct == 3
    assert m.cluster_purity == pytest.approx(3 / 5)
    assert m.cluster_completeness == pytest.approx(3 / 5)
    assert m.f1 == pytest.approx(3 / 5)
    assert m.num_pred_identities == 2
    assert m.num_gold_identities == 2


def test_pred_only_tracks_inflate_denominator(spark):
    # inter_doc_coref.rs:63-70 — all_tracks is the UNION: a predicted
    # track absent from gold contributes to num_total but to no
    # numerator (its identity's gold_cluster_counts sees nothing).
    pred = [("d", 1, 10), ("d", 99, 10)]  # t99 not in gold
    gold = [("d", 1, 0), ("d", 2, 0)]  # t2 not predicted
    m = _row(spark, pred, gold)
    assert m.num_total == 3  # {t1, t2, t99}
    assert m.num_correct == 1  # I10's max gold count (t1)
    assert m.cluster_purity == pytest.approx(1 / 3)
    assert m.cluster_completeness == pytest.approx(1 / 3)


def test_no_overlap_zero_scores(spark):
    # Disjoint track universes: num_total counts both sides, numerators 0,
    # f1's 0/0 guard (inter_doc_coref.rs:155-161) returns 0.
    m = _row(spark, [("d", 1, 10)], [("d", 2, 0)])
    assert m.num_total == 2
    assert m.num_correct == 0
    assert m.cluster_purity == 0.0
    assert m.cluster_completeness == 0.0
    assert m.f1 == 0.0


def test_duplicate_track_rows_collapse(spark):
    # The reference's HashMap insert keeps one mapping per track ref;
    # duplicated (doc_id, track_id) rows must not double-count.
    pred = [("d", 1, 10), ("d", 1, 10), ("d", 2, 10)]
    gold = [("d", 1, 0), ("d", 2, 0), ("d", 2, 0)]
    m = _row(spark, pred, gold)
    assert m.num_total == 2
    assert m.num_correct == 2
    assert m.cluster_purity == 1.0
    assert m.cluster_completeness == 1.0


# ------------------------------------------------------------ differential


def _ref_compute(predicted, gold):
    """Pure-python transcription of InterDocCorefMetrics::compute
    (inter_doc_coref.rs:38-152). predicted: {identity_id: set[track]},
    gold: list[set[track]]."""
    pred_map = {}
    for iid, refs in predicted.items():
        for t in refs:
            pred_map[t] = iid
    gold_map = {}
    for idx, cluster in enumerate(gold):
        for t in cluster:
            gold_map[t] = idx
    all_tracks = set(pred_map) | set(gold_map)
    num_total = len(all_tracks)
    if num_total == 0:
        return dict(
            cluster_purity=0.0, cluster_completeness=0.0, f1=0.0,
            num_correct=0, num_total=0,
        )
    num_correct = 0
    for refs in predicted.values():
        counts: dict[int, int] = {}
        for t in refs:
            if t in gold_map:
                counts[gold_map[t]] = counts.get(gold_map[t], 0) + 1
        num_correct += max(counts.values(), default=0)
    comp_sum = 0
    for cluster in gold:
        counts = {}
        for t in cluster:
            if t in pred_map:
                counts[pred_map[t]] = counts.get(pred_map[t], 0) + 1
        comp_sum += max(counts.values(), default=0)
    purity = num_correct / num_total
    completeness = comp_sum / num_total
    f1 = (
        0.0
        if purity + completeness == 0.0
        else 2.0 * purity * completeness / (purity + completeness)
    )
    return dict(
        cluster_purity=purity, cluster_completeness=completeness, f1=f1,
        num_correct=num_correct, num_total=num_total,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random_clusterings(spark, seed):
    rng = random.Random(seed)
    tracks = [(f"doc{rng.randrange(6)}", i) for i in range(40)]
    # random predicted partition over a random subset; ditto gold
    pred: dict[int, set] = {}
    for t in tracks:
        if rng.random() < 0.8:
            pred.setdefault(rng.randrange(8), set()).add(t)
    gold_clusters: dict[int, set] = {}
    for t in tracks:
        if rng.random() < 0.8:
            gold_clusters.setdefault(rng.randrange(8), set()).add(t)
    gold = list(gold_clusters.values())

    expect = _ref_compute(pred, gold)
    pred_rows = [(d, tid, iid) for iid, refs in pred.items() for (d, tid) in refs]
    gold_rows = [
        (d, tid, cid) for cid, refs in enumerate(gold) for (d, tid) in refs
    ]
    m = _row(spark, pred_rows, gold_rows)
    assert m.num_total == expect["num_total"]
    assert m.num_correct == expect["num_correct"]
    assert m.cluster_purity == pytest.approx(expect["cluster_purity"])
    assert m.cluster_completeness == pytest.approx(expect["cluster_completeness"])
    assert m.f1 == pytest.approx(expect["f1"])
    assert m.num_pred_identities == len(pred)
    assert m.num_gold_identities == len(gold)

"""Few-shot NER evaluation (reference: anno/src/eval/few_shot.rs).

Layers: the four transcribed reference tests (few_shot.rs:399-503); a
pure-python transcription of evaluate() as a differential oracle over
seeded random prediction/gold sets; quirk pins (surface-match
leniency, one-pred-many-golds, seqeval zero conventions,
success-threshold failed types, simulator split semantics).
"""

from __future__ import annotations

import random

import pytest

from anno_spark.eval.few_shot import (
    GOLD_SCHEMA,
    PRED_SCHEMA,
    aggregate_few_shot,
    few_shot_task_results,
    simulate_few_shot_task,
)


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _frames(spark, pred_rows, gold_rows):
    p = (
        spark.createDataFrame(pred_rows, PRED_SCHEMA)
        if pred_rows
        else spark.createDataFrame([], PRED_SCHEMA)
    )
    g = (
        spark.createDataFrame(gold_rows, GOLD_SCHEMA)
        if gold_rows
        else spark.createDataFrame([], GOLD_SCHEMA)
    )
    return p, g


def _results(spark, pred_rows, gold_rows):
    p, g = _frames(spark, pred_rows, gold_rows)
    return few_shot_task_results(p, g).collect()


# ------------------------------------------------------------ transcribed


def test_perfect_predictions(spark):
    # few_shot.rs:403-420
    pred = [("DISEASE", 2, 0, "diabetes", 4, 12, 0.95)]
    gold = [("DISEASE", 2, 0, "diabetes", 4, 12)]
    r = _results(spark, pred, gold)[0]
    assert abs(r.f1 - 1.0) < 0.01
    assert r.num_correct == 1


def test_no_predictions(spark):
    # few_shot.rs:422-439
    gold = [("DISEASE", 2, 0, "diabetes", 4, 12)]
    r = _results(spark, [], gold)[0]
    assert abs(r.recall) < 0.01
    assert r.num_correct == 0
    assert r.precision == 0.0  # seqeval convention (few_shot.rs:207-211)


def test_aggregate_results(spark):
    # few_shot.rs:441-471
    rows = [
        ("PER", 2, 0.8, 0.7, 0.75, 10, 8, 7),
        ("ORG", 2, 0.6, 0.5, 0.55, 10, 9, 5),
    ]
    df = spark.createDataFrame(
        rows,
        "entity_type string, k int, precision double, recall double,"
        " f1 double, num_gold long, num_predicted long, num_correct long",
    )
    agg = aggregate_few_shot(df)
    assert abs(agg.macro_f1 - 0.65) < 0.01
    assert len(agg.per_type) == 2


def test_failed_types_detection(spark):
    # few_shot.rs:473-503 — threshold is 0.5, not the commented 0.1
    rows = [
        ("EASY", 5, 0.9, 0.85, 0.87, 10, 10, 9),
        ("HARD", 5, 0.2, 0.1, 0.13, 10, 5, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "entity_type string, k int, precision double, recall double,"
        " f1 double, num_gold long, num_predicted long, num_correct long",
    )
    agg = aggregate_few_shot(df)
    assert "HARD" in agg.failed_types
    assert "EASY" not in agg.failed_types
    assert any("Struggling with 1 entity types" in s for s in agg.insights)


# ------------------------------------------------------------ quirks


def test_surface_match_leniency(spark):
    # wrong span but identical lowercased surface counts
    # (few_shot.rs:199-203)
    pred = [("D", 1, 0, "Diabetes", 99, 107, 0.9)]
    gold = [("D", 1, 0, "diabetes", 4, 12)]
    r = _results(spark, pred, gold)[0]
    assert r.num_correct == 1
    assert r.precision == 1.0 and r.recall == 1.0


def test_one_prediction_matches_many_golds(spark):
    # the break is per GOLD: a single prediction satisfies both
    pred = [("D", 1, 0, "flu", 0, 3, 0.9)]
    gold = [("D", 1, 0, "flu", 0, 3), ("D", 1, 0, "FLU", 10, 13)]
    r = _results(spark, pred, gold)[0]
    assert r.num_correct == 2
    assert r.num_predicted == 1
    assert r.precision == 2.0  # faithful: correct/predicted is uncapped
    assert r.recall == 1.0


def test_task_with_predictions_but_no_gold(spark):
    pred = [("D", 1, 0, "x", 0, 1, 0.9)]
    r = _results(spark, pred, [])[0]
    assert r.num_gold == 0
    assert r.recall == 0.0
    assert r.precision == 0.0
    assert r.f1 == 0.0


def test_tasks_keep_separate_k_rows(spark):
    pred = [
        ("PER", 1, 0, "ann", 0, 3, 0.9),
        ("PER", 5, 0, "ann", 0, 3, 0.9),
    ]
    gold = [
        ("PER", 1, 0, "ann", 0, 3),
        ("PER", 5, 0, "bob", 9, 12),
    ]
    rows = _results(spark, pred, gold)
    assert [(r.entity_type, r.k) for r in rows] == [("PER", 1), ("PER", 5)]
    assert rows[0].f1 == 1.0
    assert rows[1].f1 == 0.0
    agg = aggregate_few_shot(
        few_shot_task_results(*_frames(spark, pred, gold))
    )
    # per_type last-writer = highest k; macro averages BOTH rows
    assert agg.per_type["PER"].k == 5
    assert agg.macro_f1 == pytest.approx(0.5)
    assert agg.performance_by_k == [(1, 1.0), (5, 0.0)]


def test_insights_strong_learning(spark):
    rows = [
        ("A", 1, 0.2, 0.2, 0.2, 5, 5, 1),
        ("A", 10, 0.9, 0.9, 0.9, 5, 5, 4),
    ]
    df = spark.createDataFrame(
        rows,
        "entity_type string, k int, precision double, recall double,"
        " f1 double, num_gold long, num_predicted long, num_correct long",
    )
    agg = aggregate_few_shot(df)
    assert any(s.startswith("Strong learning: +70% F1") for s in agg.insights)


# ------------------------------------------------------------ differential


def _ref_evaluate(preds, golds):
    """evaluate (few_shot.rs:170-236) over [(text_id, text, start,
    end)] lists."""
    total_correct = 0
    by_tid: dict[int, list] = {}
    for tid, text, s, e in preds:
        by_tid.setdefault(tid, []).append((text, s, e))
    for tid, g_text, g_s, g_e in golds:
        for p_text, p_s, p_e in by_tid.get(tid, []):
            if (g_s == p_s and g_e == p_e) or g_text.lower() == p_text.lower():
                total_correct += 1
                break
    tp, tg = len(preds), len(golds)
    precision = total_correct / tp if tp else 0.0
    recall = total_correct / tg if tg else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return precision, recall, f1, tg, tp, total_correct


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random_tasks(spark, seed):
    rng = random.Random(seed)
    words = ["flu", "cold", "ache", "rash", "cough"]
    pred_rows, gold_rows = [], []
    expect = {}
    for t, ty in enumerate(["D1", "D2"]):
        for k in (1, 5):
            preds, golds = [], []
            for tid in range(6):
                for _ in range(rng.randint(0, 3)):
                    w = rng.choice(words)
                    s = rng.randint(0, 30)
                    golds.append((tid, w, s, s + len(w)))
                for _ in range(rng.randint(0, 3)):
                    w = rng.choice(words)
                    w = w.upper() if rng.random() < 0.3 else w
                    s = rng.randint(0, 30)
                    preds.append((tid, w, s, s + len(w)))
            expect[(ty, k)] = _ref_evaluate(preds, golds)
            pred_rows += [(ty, k, tid, w, s, e, 0.9) for tid, w, s, e in preds]
            gold_rows += [(ty, k, tid, w, s, e) for tid, w, s, e in golds]

    rows = _results(spark, pred_rows, gold_rows)
    assert len(rows) == 4
    for r in rows:
        p, rc, f1, tg, tp, tc = expect[(r.entity_type, r.k)]
        assert r.precision == pytest.approx(p), (r.entity_type, r.k)
        assert r.recall == pytest.approx(rc)
        assert r.f1 == pytest.approx(f1)
        assert (r.num_gold, r.num_predicted, r.num_correct) == (tg, tp, tc)


# ------------------------------------------------------------ simulator


def test_simulate_few_shot_task(spark):
    examples = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(10)],
        "example_idx long, text string",
    )
    ent_rows = []
    for i in range(8):  # examples 8, 9 unannotated
        ent_rows.append((i, 0, f"ent{i}", 0, 4))
        ent_rows.append((i, 1, f"other{i}", 10, 15))
    entities = spark.createDataFrame(
        ent_rows, "example_idx long, entity_idx int, text string, start long, end long"
    )
    out = simulate_few_shot_task(examples, entities, "T", 3, 4)
    assert out is not None
    support, gold = out
    s_rows = support.orderBy("text").collect()
    assert len(s_rows) == 3
    # support carries each example's FIRST entity (few_shot.rs:360-367)
    assert {r.entity_text for r in s_rows} == {"ent0", "ent1", "ent2"}
    g_rows = gold.collect()
    # queries = examples 3..6 (max_queries=4), BOTH entities each
    assert {r.text_id for r in g_rows} == {3, 4, 5, 6}
    assert len(g_rows) == 8
    assert all(r.k == 3 and r.entity_type == "T" for r in g_rows)


def test_simulate_insufficient_examples(spark):
    examples = spark.createDataFrame(
        [(0, "a"), (1, "b")], "example_idx long, text string"
    )
    entities = spark.createDataFrame(
        [(0, 0, "x", 0, 1)],
        "example_idx long, entity_idx int, text string, start long, end long",
    )
    assert simulate_few_shot_task(examples, entities, "T", 1, 5) is None

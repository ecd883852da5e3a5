"""Distributed box-embedding surface: Spark<->numpy differentials,
blocking losslessness, plan shape.

The JVM expressions in operators/boxes.py must agree bit-for-bit (to
float tolerance) with the numpy reference port in core/boxes.py, and the
grid-blocked candidate join must recover EVERY above-threshold pair a
brute-force all-pairs oracle finds.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from anno_spark.core import boxes as B
from anno_spark.operators import boxes as OB


def _random_boxes(n, dim, seed, spread=3.0, wmax=1.2):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, dim)).astype(np.float32)
    widths = rng.uniform(0.05, wmax, (n, dim)).astype(np.float32)
    return centers - widths / 2.0, centers + widths / 2.0


@pytest.fixture(scope="module")
def box_df(spark):
    mins, maxs = _random_boxes(120, 3, seed=42)
    rows = [Row(box_id=i, box_min=[float(x) for x in mins[i]],
                box_max=[float(x) for x in maxs[i]])
            for i in range(len(mins))]
    return spark.createDataFrame(rows), mins, maxs


def test_with_box_score_matches_numpy(spark, box_df):
    df, mins, maxs = box_df
    a = df.select(F.col("box_id").alias("id_a"),
                  F.col("box_min").alias("a_min"),
                  F.col("box_max").alias("a_max"))
    b = df.select(F.col("box_id").alias("id_b"),
                  F.col("box_min").alias("b_min"),
                  F.col("box_max").alias("b_max"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    got = {(r.id_a, r.id_b): (r.box_score, r.p_a_b, r.p_b_a, r.vol_a, r.inter_vol)
           for r in OB.with_box_score(pairs).collect()}
    # numpy oracle on 200 sampled pairs
    rng = np.random.default_rng(0)
    keys = rng.choice(len(got), size=200, replace=False)
    items = list(got.items())
    for k in keys:
        (i, j), (score, p_ab, p_ba, vol_a, inter) = items[k]
        assert score == pytest.approx(
            float(B.coreference_score(mins[i], maxs[i], mins[j], maxs[j])),
            rel=1e-5, abs=1e-7)
        assert p_ab == pytest.approx(
            float(B.conditional_probability(mins[i], maxs[i], mins[j], maxs[j])),
            rel=1e-5, abs=1e-7)
        assert vol_a == pytest.approx(float(B.volume(mins[i], maxs[i])),
                                      rel=1e-5)
        assert inter == pytest.approx(
            float(B.intersection_volume(mins[i], maxs[i], mins[j], maxs[j])),
            rel=1e-5, abs=1e-7)


def test_blocked_pairs_lossless_vs_brute_force(spark, box_df):
    df, mins, maxs = box_df
    threshold = 0.2
    got = {(r.id_a, r.id_b): r.box_score
           for r in OB.box_coref_pairs(df, threshold=threshold,
                                       cell_size=1.5).collect()}
    # brute-force numpy all-pairs oracle
    n = len(mins)
    scores = B.coreference_score(mins[:, None, :], maxs[:, None, :],
                                 mins[None, :, :], maxs[None, :, :])
    expected = {(i, j): float(scores[i, j])
                for i in range(n) for j in range(i + 1, n)
                if scores[i, j] >= threshold}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, rel=1e-5, abs=1e-7)


def test_blocked_pairs_lossless_small_cells(spark, box_df):
    # cell smaller than box widths -> boxes span multiple cells; the
    # explode/dedupe path must still be exact
    df, mins, maxs = box_df
    got = {(r.id_a, r.id_b) for r in
           OB.box_coref_pairs(df, threshold=0.2, cell_size=0.25).collect()}
    scores = B.coreference_score(mins[:, None, :], maxs[:, None, :],
                                 mins[None, :, :], maxs[None, :, :])
    n = len(mins)
    expected = {(i, j) for i in range(n) for j in range(i + 1, n)
                if scores[i, j] >= 0.2}
    assert got == expected


def test_blocked_pairs_two_dim_blocking(spark, box_df):
    df, mins, maxs = box_df
    got = {(r.id_a, r.id_b) for r in
           OB.box_coref_pairs(df, threshold=0.2, cell_size=1.5,
                              block_dims=2).collect()}
    scores = B.coreference_score(mins[:, None, :], maxs[:, None, :],
                                 mins[None, :, :], maxs[None, :, :])
    n = len(mins)
    expected = {(i, j) for i in range(n) for j in range(i + 1, n)
                if scores[i, j] >= 0.2}
    assert got == expected


def test_box_coref_clusters_transitive(spark):
    # chain A-B-C overlap transitively; D is far away
    rows = [
        Row(box_id=0, box_min=[0.0, 0.0], box_max=[1.0, 1.0]),
        Row(box_id=1, box_min=[0.1, 0.1], box_max=[1.1, 1.1]),
        Row(box_id=2, box_min=[0.2, 0.2], box_max=[1.2, 1.2]),
        Row(box_id=3, box_min=[8.0, 8.0], box_max=[9.0, 9.0]),
    ]
    df = spark.createDataFrame(rows)
    out = {r.box_id: r.cluster_id
           for r in OB.box_coref_clusters(df, threshold=0.5).collect()}
    assert out[0] == out[1] == out[2]
    assert out[3] != out[0]


def test_box_coref_clusters_type_gate(spark):
    rows = [
        Row(box_id=0, box_min=[0.0, 0.0], box_max=[1.0, 1.0], etype="PER"),
        Row(box_id=1, box_min=[0.0, 0.0], box_max=[1.0, 1.0], etype="ORG"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.box_id: r.cluster_id
           for r in OB.box_coref_clusters(df, threshold=0.5,
                                          type_col="etype").collect()}
    assert out[0] != out[1]


def test_boxes_from_vectors(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, embedding=[0.5, 0.5, 0.5, 9.0])])
    out = OB.boxes_from_vectors(df, radius=0.1, dims=3).collect()[0]
    assert out.box_min == pytest.approx([0.4, 0.4, 0.4])
    assert out.box_max == pytest.approx([0.6, 0.6, 0.6])


def test_box_conflicts_matches_reference_semantics(spark):
    rng = np.random.default_rng(5)
    rows = []
    claims = []
    for i in range(60):
        subject = int(rng.integers(0, 8))
        c = rng.uniform(-1, 1, 2)
        w = float(rng.choice([0.1, 0.3, 2.0]))
        trust = float(rng.uniform(0.5, 1.0))
        mn, mx = c - w / 2, c + w / 2
        rows.append(Row(subject_id=subject, claim_id=i,
                        box_min=[float(x) for x in mn],
                        box_max=[float(x) for x in mx],
                        source_trust=round(trust, 6)))
        claims.append((subject, i, mn, mx, trust))
    df = spark.createDataFrame(rows)
    got = {(r.claim_a, r.claim_b): r.severity
           for r in OB.box_conflicts(df, key_col="subject_id").collect()}
    expected = {}
    for a in range(len(claims)):
        for b in range(a + 1, len(claims)):
            sa, ia, mna, mxa, ta = claims[a]
            sb, ib, mnb, mxb, tb = claims[b]
            if sa != sb:
                continue
            conflict = B.UncertainBox(mna, mxa, ta).detect_conflict(
                B.UncertainBox(mnb, mxb, tb))
            if conflict is not None:
                expected[(ia, ib)] = conflict.severity
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-5)


def test_pair_generation_plan_has_no_cartesian(spark, box_df):
    df, _, _ = box_df
    plan = OB.box_coref_pairs(df, threshold=0.2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

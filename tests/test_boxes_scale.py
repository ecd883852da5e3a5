"""Box-embedding blocking at scale: planted-pair recall, candidate
accounting, and plan shape at 2*10^5 boxes.

The 100-TB claim for operators/boxes.py rests on the grid blocking
never going all-pairs while staying lossless.  A brute-force oracle is
impossible at this size, so correctness is evidenced by PLANTED pairs:
boxes dropped at random with known above-threshold twins must all come
back, while the candidate volume stays near the analytic per-cell
bound (SURVEY §4 skew rules; same evidence style as
tests/test_linking_scale.py).
"""

from __future__ import annotations

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from anno_spark.operators import boxes as OB

N_BASE = 100_000
N_PLANTED = 300
DIM = 3
CELL = 1.0
THRESHOLD = 0.5
BLOCK_DIMS = 3  # 1-D stripes degenerate at this density: ~80 stripes
               # x 100k boxes = 1.6e8 candidates; 3-D cells keep
               # occupancy O(1) per cell (the knob exists for this)
SPREAD = 40.0  # centers uniform in [-SPREAD, SPREAD)^3 -> ~80^3 cells


@pytest.fixture(scope="module")
def big_boxes(spark):
    """Deterministic synthetic boxes: wide uniform scatter (sparse cells)
    plus planted twin pairs with guaranteed score >= threshold."""
    rng = np.random.default_rng(2024)
    centers = rng.uniform(-SPREAD, SPREAD, (N_BASE, DIM)).astype(np.float32)
    widths = rng.uniform(0.05, 0.3, (N_BASE, DIM)).astype(np.float32)
    rows = []
    for i in range(N_BASE):
        mn = centers[i] - widths[i] / 2
        mx = centers[i] + widths[i] / 2
        rows.append((i, [float(x) for x in mn], [float(x) for x in mx]))
    # planted twins: identical box nudged by 2% of width -> score ~0.94
    planted = []
    for k in range(N_PLANTED):
        src = int(rng.integers(0, N_BASE))
        mn = np.array(rows[src][1], np.float32)
        mx = np.array(rows[src][2], np.float32)
        nudge = (mx - mn) * 0.02
        twin_id = N_BASE + k
        rows.append((twin_id, [float(x) for x in mn + nudge],
                     [float(x) for x in mx + nudge]))
        planted.append((src, twin_id))
    df = spark.createDataFrame(
        rows, "box_id long, box_min array<double>, box_max array<double>")
    return df.repartition(8).cache(), planted


def test_planted_pairs_all_recovered(spark, big_boxes):
    df, planted = big_boxes
    t0 = time.perf_counter()
    pairs = OB.box_coref_pairs(df, threshold=THRESHOLD, cell_size=CELL,
                               block_dims=BLOCK_DIMS)
    found = {(r.id_a, r.id_b) for r in
             pairs.where(F.col("id_a") >= 0).collect()}
    wall = time.perf_counter() - t0
    expected = {(min(a, b), max(a, b)) for (a, b) in planted}
    missing = expected - found
    assert not missing, f"{len(missing)} planted pairs lost"
    # sanity on total volume: far below all-pairs (2e5 choose 2 = 2e10)
    assert len(found) < 5_000_000
    # wall-clock guard is generous for host jitter but kills O(n^2)
    assert wall < 300, f"box blocking took {wall:.0f}s"


def test_candidate_volume_near_analytic_bound(spark, big_boxes):
    df, _ = big_boxes
    # candidate pairs before scoring = sum over cells of C(n_c, 2)
    # (minus multi-cell dedup); compare against the analytic estimate
    # from the cell histogram — the blocking must not degenerate
    cell = F.floor(F.element_at("box_min", 1) / CELL).cast("long")
    hist = (df.select(F.explode(F.sequence(
        F.floor(F.element_at("box_min", 1) / CELL).cast("long"),
        F.floor(F.element_at("box_max", 1) / CELL).cast("long")))
        .alias("c"))
        .groupBy("c").count())
    bound = hist.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("b")
    ).collect()[0]["b"]
    n_total = df.count()
    all_pairs = n_total * (n_total - 1) / 2
    # the dim-0 blocking alone must cut the pair space by >= 50x
    assert bound < all_pairs / 50, (bound, all_pairs)


def test_plan_is_shuffle_join_not_cartesian(spark, big_boxes):
    df, _ = big_boxes
    plan = OB.box_coref_pairs(df, threshold=THRESHOLD, cell_size=CELL,
                               block_dims=BLOCK_DIMS) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pair_dedup_is_map_side(spark, big_boxes):
    """The only hash exchanges are the cell join's two inputs (box-
    proportional); past the join the pair stream is exchange-free — the
    min-shared-cell filter replaced the (id_a, id_b) dropDuplicates
    whose shuffle volume grew with the PAIR count."""
    import re

    df, _ = big_boxes
    plan = OB.box_coref_pairs(df, threshold=THRESHOLD, cell_size=CELL,
                              block_dims=BLOCK_DIMS) \
        ._jdf.queryExecution().executedPlan().toString()
    # once the cached fixture's stats are known Catalyst may broadcast
    # the cell join (zero hash exchanges) — the gate is that NO exchange
    # ever partitions by pair identity, not that the join shuffles
    parts = re.findall(r"Exchange hashpartitioning\(([^,)]+)", plan)
    assert all(p.startswith("cell") for p in parts), parts
    assert "Join" in plan


def _reference_pairs(df, threshold, cell_size, block_dims):
    """The pre-emit-once path: explode cells, join, dropDuplicates."""
    cell = OB._cells(F.col("box_min"), F.col("box_max"), 0, cell_size)
    for d in range(1, block_dims):
        nxt = OB._cells(F.col("box_min"), F.col("box_max"), d, cell_size)
        cell = F.flatten(F.transform(
            cell, lambda c: F.transform(
                nxt, lambda n: F.concat_ws(":", c.cast("string"),
                                           n.cast("string")))))
    tagged = df.select("box_id", "box_min", "box_max",
                       F.explode(cell).alias("cell"))
    left = tagged.select(
        "cell", F.col("box_id").alias("id_a"),
        F.col("box_min").alias("a_min"), F.col("box_max").alias("a_max"))
    right = tagged.select(
        "cell", F.col("box_id").alias("id_b"),
        F.col("box_min").alias("b_min"), F.col("box_max").alias("b_max"))
    cand = (left.join(right, "cell").where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    scored = OB.with_box_score(cand).where(
        F.col("box_score") >= F.lit(float(threshold)))
    return {(r.id_a, r.id_b) for r in scored.select("id_a", "id_b").collect()}


def test_emit_once_matches_dropduplicates_reference(spark):
    """Map-side min-shared-cell dedup == the dropDuplicates reference on
    WIDE boxes spanning several cells each (incl. negative coordinates,
    where floor-division cell math is easiest to get wrong), at
    block_dims 1 and 3 — and each pair is emitted exactly once."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        mn = rng.uniform(-5.0, 5.0, DIM)
        w = rng.uniform(0.5, 3.0, DIM)  # spans up to 4 cells per dim
        rows.append((i, [float(x) for x in mn], [float(x) for x in mn + w]))
    df = spark.createDataFrame(
        rows, "box_id long, box_min array<double>, box_max array<double>"
    ).cache()
    for bd in (1, 3):
        got_rows = OB.box_coref_pairs(
            df, threshold=0.1, cell_size=CELL, block_dims=bd
        ).select("id_a", "id_b").collect()
        got = {(r.id_a, r.id_b) for r in got_rows}
        assert len(got_rows) == len(got), "a pair was emitted from >1 cell"
        ref = _reference_pairs(df, threshold=0.1, cell_size=CELL,
                               block_dims=bd)
        assert got == ref and len(got) > 0, bd
    df.unpersist()

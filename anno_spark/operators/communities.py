"""L1/L2 — community detection over the materialized graph (SURVEY §2.8).

Two algorithms:

* :func:`leiden_communities` — the production path: modularity-objective
  local moving (strata/src/leiden.rs:58-160) as an iterative DataFrame
  loop. The objective is the reference's edge-sum modularity with
  resolution γ (leiden.rs:169-283):

      Q = (1/2m) · Σ_{edges (a,b) with c_a = c_b} [w_ab − γ·k_a·k_b/(2m)]

  Moving node i from community c to community d changes Q only through
  i's incident edges, so the gain of every candidate move is a per-node
  aggregate  S(i,d) = Σ_{j∈d, j~i} (w_ij − γ·k_i·k_j/(2m))  — one join +
  one groupBy per round, fully distributed. A node moves to the
  neighboring community with the highest positive gain over staying
  (leiden.rs:101-147), or to a fresh singleton when even that beats all
  neighbors (leiden.rs:131-141 ⇔ S(i,current)<0 and all S(i,d)≤0).

  The reference visits nodes sequentially in seeded-shuffle order; the
  synchronous-parallel analogue oscillates on symmetric structures (two
  nodes swapping communities forever), so rounds alternate move
  DIRECTION: even rounds apply only moves to a smaller community id,
  odd rounds only to a larger one. All moves in a round point the same
  way, so same-round swaps and rotation cycles are structurally
  impossible — the standard determinism device in distributed
  Louvain/Leiden. Community ids are canonicalized to min(node_id) per
  community at the end.

* :func:`label_propagation` — cheaper non-objective fallback. Each node's
  own current label joins the weighted vote (self-vote), so ties keep or
  merge labels monotonically instead of oscillating (ADVICE r01: a—b
  previously swapped labels every round and the result depended on
  iteration parity).

Hierarchy (L2): the reference's HierarchicalLeiden (strata/src/lib.rs:
38-112) reruns Leiden on the SAME graph at resolution γ·2^level per
level — :func:`hierarchical_communities` mirrors that exactly (it does
NOT contract the graph between levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anno_spark.plans.iterloop import iter_checkpoint


def _symmetrize(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """edges → undirected (a, b, w) with parallel edges summed."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return (
        edges.select(
            F.col("src_node").alias("a"), F.col("dst_node").alias("b"), w.alias("w")
        )
        .union(
            edges.select(
                F.col("dst_node").alias("a"), F.col("src_node").alias("b"), w.alias("w")
            )
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """nodes(node_id), edges(src_node, dst_node[, weight]) →
    (node_id, community_id).

    Each round every node adopts the label with the greatest incident
    weight among its neighbors AND itself (self-vote weight 1.0 — the
    ADVICE r01 oscillation fix); ties → smallest label; stops when no
    label changes or after ``max_iterations``.
    """
    sym = _symmetrize(edges, weight_col).localCheckpoint()
    labels = nodes.select(
        F.col("node_id"), F.col("node_id").alias("community_id")
    ).localCheckpoint()

    for _ in range(max_iterations):
        nbr_votes = sym.join(labels, sym["b"] == labels["node_id"]).select(
            F.col("a").alias("node_id"), "community_id", "w"
        )
        self_votes = labels.select("node_id", "community_id", F.lit(1.0).alias("w"))
        nbr = (
            nbr_votes.union(self_votes)
            .groupBy("node_id", "community_id")
            .agg(F.sum("w").alias("wsum"))
        )
        rank = Window.partitionBy("node_id").orderBy(
            F.desc("wsum"), F.asc("community_id")
        )
        best = (
            nbr.withColumn("rn", F.row_number().over(rank))
            .where(F.col("rn") == 1)
            .select("node_id", F.col("community_id").alias("new_community_id"))
        )
        updated = (
            labels.join(best, "node_id", "left")
            .select(
                "node_id",
                F.coalesce("new_community_id", "community_id").alias("community_id"),
                (F.coalesce("new_community_id", "community_id")
                 != F.col("community_id")).alias("changed"),
            )
        )
        updated = iter_checkpoint(updated)
        labels = updated.select("node_id", "community_id")
        if len(updated.where("changed").take(1)) == 0:
            break
    return labels


def leiden_communities(
    nodes: DataFrame,
    edges: DataFrame,
    resolution: float = 1.0,
    max_iterations: int = 15,
    weight_col: str | None = None,
) -> DataFrame:
    """L1 — modularity local moving (strata/src/leiden.rs:58-160) →
    (node_id, community_id); community_id = min node_id in the community.

    Scale shape per round: one (edge ⋈ labels) hash join + one groupBy —
    both shuffle on node ids; the degree table and 2m are computed once.
    No per-move global recomputation (the reference's O(V·E) sweep,
    leiden.rs:169-283, collapses into the per-edge gain terms).
    """
    sym = _symmetrize(edges, weight_col).localCheckpoint()
    # degrees k_i and total weight m (each undirected edge counted once)
    deg = sym.groupBy(F.col("a").alias("node_id")).agg(F.sum("w").alias("k"))
    m_row = sym.agg((F.sum("w") / 2.0).alias("m")).collect()[0]
    m = float(m_row["m"] or 0.0)
    if m == 0.0:
        return nodes.select(
            "node_id", F.col("node_id").alias("community_id")
        )
    two_m = 2.0 * m

    # per-edge gain term: w_ij − γ·k_i·k_j/(2m), precomputed once
    kd = deg
    gain_edges = (
        sym.join(kd.withColumnRenamed("node_id", "a").withColumnRenamed("k", "k_a"), "a")
        .join(kd.withColumnRenamed("node_id", "b").withColumnRenamed("k", "k_b"), "b")
        .select(
            "a",
            "b",
            (F.col("w") - F.lit(resolution) * F.col("k_a") * F.col("k_b") / F.lit(two_m)).alias("g"),
        )
        .localCheckpoint()
    )

    labels = nodes.select(
        F.col("node_id"), F.col("node_id").alias("community_id")
    ).localCheckpoint()

    quiet = 0  # consecutive no-move rounds; need 2 (one per parity class)
    for it in range(max_iterations):
        # S(i, d): total gain term between node i and community d
        lbl_b = labels.select(
            F.col("node_id").alias("b"), F.col("community_id").alias("comm_b")
        )
        s = (
            gain_edges.join(lbl_b, "b")
            .groupBy(F.col("a").alias("node_id"), F.col("comm_b").alias("cand"))
            .agg(F.sum("g").alias("s"))
        )
        cur = labels.withColumnRenamed("community_id", "cur_comm")
        # one materialization per round: stay/cand/solo all branch off s,
        # and without this the join+groupBy would re-execute 3-4× per
        # round inside one action's DAG
        s = iter_checkpoint(s.join(cur, "node_id"))
        # gain of staying: S(i, current) over i's edges into its own
        # community (i itself contributes nothing — no self-loops)
        stay = s.where(F.col("cand") == F.col("cur_comm")).select(
            "node_id", F.col("cur_comm"), F.col("s").alias("s_stay")
        )
        cand = (
            s.where(F.col("cand") != F.col("cur_comm"))
            .join(stay.select("node_id", "s_stay"), "node_id", "left")
            .withColumn("s_stay", F.coalesce("s_stay", F.lit(0.0)))
            # ΔQ·2m of the move; the fresh-singleton option is Δ = −s_stay,
            # i.e. when s_stay < 0 and no candidate beats leaving alone
            .withColumn("delta", F.col("s") - F.col("s_stay"))
        )
        rank = Window.partitionBy("node_id").orderBy(F.desc("delta"), F.asc("cand"))
        best = (
            cand.withColumn("rn", F.row_number().over(rank))
            .where((F.col("rn") == 1) & (F.col("delta") > 1e-12))
            .select("node_id", F.col("cand").alias("move_to"), "cur_comm")
        )
        # fresh-singleton moves: s_stay < 0 and every neighbor-community
        # delta ≤ 0 → the node leaves to its own community (= its node_id,
        # which is unoccupied iff it previously merged away; using node_id
        # is safe because the final relabel canonicalizes ids anyway)
        solo = (
            stay.where(F.col("s_stay") < -1e-12)
            .join(best, "node_id", "left_anti")
            .select("node_id", F.col("node_id").alias("move_to"), "cur_comm")
        )
        moves = best.union(solo)
        # direction-alternating gate: even rounds apply only moves to a
        # SMALLER community id, odd rounds only to a LARGER one. Within a
        # round every move points the same way, so two nodes can never
        # swap communities and no same-round rotation cycle can form —
        # the synchronous-update oscillation that plagues parallel
        # Louvain/LPA (ADVICE r01) is structurally impossible, and unlike
        # half-the-nodes parity gating every improving node still moves.
        if it % 2 == 0:
            moves = moves.where(F.col("move_to") < F.col("cur_comm"))
        else:
            moves = moves.where(F.col("move_to") > F.col("cur_comm"))
        moves = moves.select("node_id", "move_to")
        updated = (
            labels.join(moves, "node_id", "left")
            .select(
                "node_id",
                F.coalesce("move_to", "community_id").alias("community_id"),
                F.col("move_to").isNotNull().alias("changed"),
            )
        )
        updated = iter_checkpoint(updated)
        labels = updated.select("node_id", "community_id")
        # post-checkpoint probe is a cached scan — probe every round. A
        # single quiet round can just mean the active parity class had no
        # moves; converged = 2 consecutive quiet rounds (both classes).
        quiet = quiet + 1 if len(updated.where("changed").take(1)) == 0 else 0
        if quiet >= 2:
            break

    # canonicalize: community_id := min(node_id) of its members
    canon = labels.groupBy("community_id").agg(F.min("node_id").alias("canon_id"))
    return labels.join(canon, "community_id").select(
        "node_id", F.col("canon_id").alias("community_id")
    )


def modularity(
    labels: DataFrame,
    edges: DataFrame,
    resolution: float = 1.0,
    weight_col: str | None = None,
) -> float:
    """The reference's edge-sum modularity (leiden.rs:169-283) of a
    partition — used by tests to verify local moving improves Q."""
    sym = _symmetrize(edges, weight_col)
    deg = sym.groupBy(F.col("a").alias("node_id")).agg(F.sum("w").alias("k"))
    m = float(sym.agg((F.sum("w") / 2.0).alias("m")).collect()[0]["m"] or 0.0)
    if m == 0.0:
        return 0.0
    lbl = labels.select("node_id", "community_id")
    q = (
        sym.join(lbl.withColumnRenamed("node_id", "a").withColumnRenamed("community_id", "ca"), "a")
        .join(lbl.withColumnRenamed("node_id", "b").withColumnRenamed("community_id", "cb"), "b")
        .join(deg.withColumnRenamed("node_id", "a").withColumnRenamed("k", "k_a"), "a")
        .join(deg.withColumnRenamed("node_id", "b").withColumnRenamed("k", "k_b"), "b")
        .where(F.col("ca") == F.col("cb"))
        .agg(
            F.sum(
                F.col("w") - F.lit(resolution) * F.col("k_a") * F.col("k_b") / F.lit(2.0 * m)
            ).alias("q")
        )
        .collect()[0]["q"]
    )
    # sym double-counts each undirected edge → q is 2× the edge sum;
    # reference divides the single-counted sum by 2m
    return float(q or 0.0) / 2.0 / (2.0 * m)


def contract(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Community graph (edges between communities, weights summed,
    self-loops dropped) — kept for callers building condensed views."""
    c = communities
    e = (
        edges.join(
            c.withColumnRenamed("node_id", "src_node").withColumnRenamed(
                "community_id", "src_comm"
            ),
            "src_node",
        )
        .join(
            c.withColumnRenamed("node_id", "dst_node").withColumnRenamed(
                "community_id", "dst_comm"
            ),
            "dst_node",
        )
        .where(F.col("src_comm") != F.col("dst_comm"))
    )
    return e.groupBy(
        F.col("src_comm").alias("src_node"), F.col("dst_comm").alias("dst_node")
    ).agg(F.count("*").cast("double").alias("weight"))


def hierarchical_communities(
    nodes: DataFrame,
    edges: DataFrame,
    levels: int = 2,
    resolution: float = 1.0,
    weight_col: str | None = None,
) -> DataFrame:
    """L2 — HierarchicalLeiden (strata/src/lib.rs:38-112): level k is an
    independent Leiden run on the SAME graph at resolution γ·2^k (higher
    resolution → more, smaller communities). → (node_id, level_0, ...)."""
    out = None
    for level in range(levels):
        comm = leiden_communities(
            nodes, edges, resolution=resolution * (2.0 ** level), weight_col=weight_col
        ).withColumnRenamed("community_id", f"level_{level}")
        out = comm if out is None else out.join(comm, "node_id", "left")
    return out

"""L1/L2 — community detection over the materialized graph (SURVEY §2.8).

The reference's strata crate runs greedy-modularity Leiden
(strata/src/leiden.rs:58-160) single-threaded over an in-memory graph.
The Spark-native equivalent here is synchronous label propagation as an
iterative DataFrame loop — the standard distributed stand-in for
modularity clustering at graph scales where per-move modularity
recomputation (O(V·E) per sweep in the reference, leiden.rs:169-283) is
impossible. Deterministic: ties break to the smallest label, synchronous
updates, fixed iteration cap.

Hierarchy (L2, strata/src/lib.rs:38-112): run again on the contracted
community graph via :func:`contract`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """nodes(node_id), edges(src_node, dst_node[, weight]) →
    (node_id, community_id).

    Each round every node adopts the label with the greatest incident
    weight among its neighbors (ties → smallest label); stops when no
    label changes or after ``max_iterations``.
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    sym = (
        edges.select(F.col("src_node").alias("a"), F.col("dst_node").alias("b"), w.alias("w"))
        .union(edges.select(F.col("dst_node").alias("a"), F.col("src_node").alias("b"), w.alias("w")))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col("node_id"), F.col("node_id").alias("community_id")
    ).localCheckpoint()

    for _ in range(max_iterations):
        nbr = (
            sym.join(labels, sym["b"] == labels["node_id"])
            .select(F.col("a").alias("node_id"), "community_id", "w")
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
            .localCheckpoint()
        )
        labels = updated.select("node_id", "community_id")
        if len(updated.where("changed").take(1)) == 0:
            break
    return labels


def contract(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Community graph for the next hierarchy level: edges between
    communities with summed weights (self-loops dropped)."""
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
    nodes: DataFrame, edges: DataFrame, levels: int = 2
) -> DataFrame:
    """L2 — (node_id, community ids per level as array). Level 0 = LPA on
    the raw graph; level k+1 = LPA on the contracted community graph."""
    assignments = []
    cur_nodes, cur_edges = nodes, edges
    mapping = None
    for _ in range(levels):
        comm = label_propagation(cur_nodes, cur_edges)
        if mapping is None:
            mapping = comm.select("node_id", F.col("community_id").alias("c"))
        else:
            mapping = (
                mapping.join(
                    comm.withColumnRenamed("node_id", "c").withColumnRenamed(
                        "community_id", "c_next"
                    ),
                    "c",
                )
                .select("node_id", F.col("c_next").alias("c"))
            )
        assignments.append(
            mapping.select("node_id", F.col("c").alias("community_id")).localCheckpoint()
        )
        cur_edges = contract(cur_edges, comm).localCheckpoint()
        cur_nodes = (
            cur_edges.select(F.col("src_node").alias("node_id"))
            .union(cur_edges.select("dst_node"))
            .distinct()
        )
        if cur_edges.isEmpty():
            break
    out = assignments[0].withColumnRenamed("community_id", "level_0")
    for i, a in enumerate(assignments[1:], start=1):
        out = out.join(
            a.withColumnRenamed("community_id", f"level_{i}"), "node_id", "left"
        )
    return out

"""E3 — B³ cluster metrics (SURVEY §2.9; anno/src/eval/cdcr.rs:587-673).

B³ (Bagga & Baldwin 1998), computed relationally: for assignments
pred(mention_id, cluster_id) and gold(mention_id, cluster_id),

    total_precision = Σ_{(pc,gc)} n_pg² / |pc|
    total_recall    = Σ_{(pc,gc)} n_pg² / |gc|

where n_pg = |mentions in pred-cluster pc ∩ gold-cluster gc| — one join
plus three aggregations, no per-mention loop. Mentions present in only
one side contribute 0 (cdcr.rs:630-638) and count in the denominator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BCubed:
    precision: float
    recall: float
    f1: float
    n_mentions: int


def b_cubed_df(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """B³ as a one-row DataFrame (precision, recall, f1 rounded to 6,
    n_mentions) — no collect; driver-oracle-able."""
    p = pred.select("mention_id", F.col("cluster_id").alias("pc"))
    g = gold.select("mention_id", F.col("cluster_id").alias("gc"))

    pc_sizes = p.groupBy("pc").agg(F.count("*").alias("pc_n"))
    gc_sizes = g.groupBy("gc").agg(F.count("*").alias("gc_n"))
    sums = (
        p.join(g, "mention_id")
        .groupBy("pc", "gc")
        .agg(F.count("*").alias("n_pg"))
        .join(pc_sizes, "pc")
        .join(gc_sizes, "gc")
        .agg(
            F.sum(F.col("n_pg") * F.col("n_pg") / F.col("pc_n")).alias("tp"),
            F.sum(F.col("n_pg") * F.col("n_pg") / F.col("gc_n")).alias("tr"),
        )
    )
    n_df = (
        p.select("mention_id")
        .union(g.select("mention_id"))
        .distinct()
        .agg(F.count("*").alias("n_mentions"))
    )
    j = sums.crossJoin(n_df)
    prec = F.when(
        F.col("n_mentions") > 0, F.coalesce("tp", F.lit(0.0)) / F.col("n_mentions")
    ).otherwise(0.0)
    rec = F.when(
        F.col("n_mentions") > 0, F.coalesce("tr", F.lit(0.0)) / F.col("n_mentions")
    ).otherwise(0.0)
    return j.select(
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0), 6
        ).alias("f1"),
        "n_mentions",
    )


def b_cubed(pred: DataFrame, gold: DataFrame) -> BCubed:
    """pred/gold: (mention_id, cluster_id) → B³ scores (unrounded — the
    exact cdcr.rs arithmetic; the rounded DataFrame surface is
    :func:`b_cubed_df`)."""
    p = pred.select("mention_id", F.col("cluster_id").alias("pc"))
    g = gold.select("mention_id", F.col("cluster_id").alias("gc"))

    pc_sizes = p.groupBy("pc").agg(F.count("*").alias("pc_n"))
    gc_sizes = g.groupBy("gc").agg(F.count("*").alias("gc_n"))
    inter = (
        p.join(g, "mention_id")
        .groupBy("pc", "gc")
        .agg(F.count("*").alias("n_pg"))
        .join(pc_sizes, "pc")
        .join(gc_sizes, "gc")
    )
    sums = inter.agg(
        F.sum(F.col("n_pg") * F.col("n_pg") / F.col("pc_n")).alias("tp"),
        F.sum(F.col("n_pg") * F.col("n_pg") / F.col("gc_n")).alias("tr"),
    ).collect()[0]
    n = (
        p.select("mention_id")
        .union(g.select("mention_id"))
        .distinct()
        .count()
    )
    if n == 0:
        return BCubed(0.0, 0.0, 0.0, 0)
    precision = (sums["tp"] or 0.0) / n
    recall = (sums["tr"] or 0.0) / n
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return BCubed(precision, recall, f1, n)

"""E2 — relation/triple evaluation with the reference's STRICT semantics
(anno/src/eval/relation.rs:158-343): a predicted triple matches a gold
triple iff head span (start,end) and tail span (start,end) are exactly
equal and the relation type matches case-insensitively; matching is 1-1
(greedy, relation.rs:256-294). This defines the P/R ≥ 0.95 gate
(BASELINE.json).

Implemented relationally: both sides reduce to multisets of
(url, subj_start, subj_end, obj_start, obj_end, lower(pred)); the 1-1
greedy matching over exact keys is a per-key min(count_pred, count_gold)
— computed with one aggregation per side and a full outer join, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["url", "subj_start", "subj_end", "obj_start", "obj_end", "pred_lower"]


def _keyed_counts(triples: DataFrame) -> DataFrame:
    return (
        triples.select(
            "url",
            "subj_start",
            "subj_end",
            "obj_start",
            "obj_end",
            F.lower("pred").alias("pred_lower"),
        )
        .groupBy(*_KEY)
        .agg(F.count("*").alias("n"))
    )


@dataclass
class PRF:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_gold: int
    n_matched: int


def strict_match_counts(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """→ one row: (n_pred, n_gold, n_matched) under strict 1-1 matching."""
    p = _keyed_counts(pred).withColumnRenamed("n", "n_pred")
    g = _keyed_counts(gold).withColumnRenamed("n", "n_gold")
    joined = p.join(g, _KEY, "full_outer").select(
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
    )
    return joined.agg(
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_gold").alias("n_gold"),
        F.sum(F.least("n_pred", "n_gold")).alias("n_matched"),
    )


def relation_prf(pred: DataFrame, gold: DataFrame) -> PRF:
    row = strict_match_counts(pred, gold).collect()[0]
    n_pred, n_gold, n_matched = row["n_pred"], row["n_gold"], row["n_matched"]
    precision = n_matched / n_pred if n_pred else 0.0
    recall = n_matched / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return PRF(precision, recall, f1, n_pred, n_gold, n_matched)

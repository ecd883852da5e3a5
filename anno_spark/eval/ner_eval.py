"""E1 — NER evaluation (SURVEY §2.9; anno/src/eval/ner_metrics.rs).

Exact mode: a predicted mention matches gold iff (url, start, end,
entity_type) are equal — 1-1 multiset matching, computed relationally
like the relation eval. Partial mode (boundary-relaxed): same type and
span overlap, greedy 1-1 in document order (ner_metrics.rs:55-100) —
doc-local, so it runs inside one aggregation per url.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["url", "start", "end", "entity_type"]


@dataclass
class NerPRF:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_gold: int
    n_matched: int


def _prf(n_pred, n_gold, n_matched) -> NerPRF:
    p = n_matched / n_pred if n_pred else 0.0
    r = n_matched / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
    return NerPRF(p, r, f1, n_pred, n_gold, n_matched)


def ner_prf_exact_df(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """The exact-mode PRF as a one-row DataFrame (no collect): multiset
    matching on (url, start, end, entity_type) via a full-outer join,
    then the P/R/F1 arithmetic as JVM expressions — driver-oracle-able
    and composable into larger eval pipelines."""
    pk = pred.groupBy(*_KEY).agg(F.count("*").alias("n_pred"))
    gk = gold.groupBy(*_KEY).agg(F.count("*").alias("n_gold"))
    j = pk.join(gk, _KEY, "full_outer").select(
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
    )
    agg = j.agg(
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_gold").alias("n_gold"),
        F.sum(F.least("n_pred", "n_gold")).alias("n_matched"),
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    r = F.when(F.col("n_gold") > 0, F.col("n_matched") / F.col("n_gold")).otherwise(0.0)
    return agg.select(
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(
            F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0), 6
        ).alias("f1"),
        "n_pred", "n_gold", "n_matched",
    )


def ner_prf_by_type_df(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Exact-mode PRF per entity type: the same (url, start, end,
    entity_type) multiset matching as :func:`ner_prf_exact_df`, rolled
    up by type instead of globally. Output: (entity_type, count,
    precision, recall, f1) where ``count`` is the number of GOLD
    entities of that type — the frequency the long-tail analyzer
    buckets by (long_tail.rs:252-257 builds EntityFrequency from the
    gold counts). Types appearing only in predictions still get a row
    (count 0, recall 0)."""
    pk = pred.groupBy(*_KEY).agg(F.count("*").alias("n_pred"))
    gk = gold.groupBy(*_KEY).agg(F.count("*").alias("n_gold"))
    j = pk.join(gk, _KEY, "full_outer").select(
        "entity_type",
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
    )
    agg = j.groupBy("entity_type").agg(
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_gold").alias("n_gold"),
        F.sum(F.least("n_pred", "n_gold")).alias("n_matched"),
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    r = F.when(F.col("n_gold") > 0, F.col("n_matched") / F.col("n_gold")).otherwise(0.0)
    return agg.select(
        "entity_type",
        F.col("n_gold").alias("count"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0), 6).alias("f1"),
    )


def ner_prf_exact(pred: DataFrame, gold: DataFrame) -> NerPRF:
    row = ner_prf_exact_df(pred, gold).collect()[0]
    return _prf(row["n_pred"] or 0, row["n_gold"] or 0, row["n_matched"] or 0)


def ner_prf_partial(pred: DataFrame, gold: DataFrame) -> NerPRF:
    """Greedy 1-1 overlap matching per url (same type, spans overlap),
    predictions in (start, end) order — doc-local via applyInPandas."""
    import pandas as pd

    cols = ["url", "start", "end", "entity_type", "side"]
    both = (
        pred.select(*_KEY).withColumn("side", F.lit("p"))
        .unionByName(gold.select(*_KEY).withColumn("side", F.lit("g")))
        .select(*cols)
    )

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        preds = pdf[pdf["side"] == "p"].sort_values(["start", "end"]).to_dict("records")
        golds = pdf[pdf["side"] == "g"].sort_values(["start", "end"]).to_dict("records")
        used = [False] * len(golds)
        matched = 0
        for p in preds:
            for i, g in enumerate(golds):
                if used[i]:
                    continue
                if (
                    g["entity_type"] == p["entity_type"]
                    and p["start"] < g["end"]
                    and g["start"] < p["end"]
                ):
                    used[i] = True
                    matched += 1
                    break
        return pd.DataFrame(
            {"n_pred": [len(preds)], "n_gold": [len(golds)], "n_matched": [matched]}
        )

    per_url = both.groupBy("url").applyInPandas(
        match, schema="n_pred long, n_gold long, n_matched long"
    )
    row = per_url.agg(
        F.sum("n_pred").alias("p"),
        F.sum("n_gold").alias("g"),
        F.sum("n_matched").alias("m"),
    ).collect()[0]
    return _prf(row["p"] or 0, row["g"] or 0, row["m"] or 0)

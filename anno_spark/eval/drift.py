"""Extraction-drift detection (reference: anno/src/eval/drift.rs:
analyze_confidence_drift :360-390, analyze_distribution_drift
:391-445, analyze_vocabulary_drift :448-476).

The reference buffers windows of logged predictions in memory and
compares the FIRST window (baseline) to the LAST (current). Here a
window id column plays that role — at 10¹² predictions windows are
date partitions, and everything below is a handful of map-side-combined
aggregations over (window, entity_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# drift.rs:407 — missing types get epsilon instead of 0 in the KL term
KL_EPSILON = 1e-10
# drift.rs:424-431 — a type's frequency share must move by >0.05 to be
# reported as increased/decreased
FREQ_CHANGE_THRESHOLD = 0.05


def drift_report(
    preds: DataFrame,
    window_col: str = "window",
    type_col: str = "entity_type",
    conf_col: str = "confidence",
    surface_col: str | None = None,
    confidence_drift_threshold: float = 0.1,
) -> DataFrame:
    """→ ONE row comparing baseline (min window id) to current (max):

    baseline_mean_conf, current_mean_conf, drift_amount (current−baseline,
    drift.rs:380), conf_drift_significant, kl_divergence
    (KL(current‖baseline) over type shares, ε-smoothed, drift.rs:406-413),
    n_new_types / n_increased_types / n_decreased_types (±0.05 share,
    drift.rs:420-437), and — when ``surface_col`` is given — the
    vocabulary new-token rate (distinct current surfaces absent from the
    baseline vocabulary / distinct current surfaces, drift.rs:448-476).
    """
    w = F.col(window_col)
    base = preds.agg(F.min(w).alias("b"), F.max(w).alias("c")).collect()[0]
    lo, hi = base["b"], base["c"]
    tagged = preds.select(
        F.when(w == lo, F.lit("base")).when(w == hi, F.lit("cur")).alias("side"),
        F.col(type_col).alias("etype"),
        F.col(conf_col).cast("double").alias("conf"),
        *([F.col(surface_col).alias("surface")] if surface_col else []),
    ).where(F.col("side").isNotNull())

    conf_stats = tagged.groupBy("side").agg(F.avg("conf").alias("mean_conf"))
    type_counts = tagged.groupBy("side", "etype").agg(F.count("*").alias("n"))
    totals = type_counts.groupBy("side").agg(F.sum("n").alias("total"))
    shares = type_counts.join(totals, "side").select(
        "side", "etype", (F.col("n") / F.col("total")).alias("p")
    )
    b = shares.where(F.col("side") == "base").select(
        "etype", F.col("p").alias("p_base")
    )
    c = shares.where(F.col("side") == "cur").select(
        "etype", F.col("p").alias("p_cur")
    )
    j = c.join(b, "etype", "left")
    # KL iterates over CURRENT types only (drift.rs:410)
    dist = j.agg(
        F.sum(
            F.col("p_cur")
            * F.log(F.col("p_cur") / F.coalesce("p_base", F.lit(KL_EPSILON)))
        ).alias("kl_divergence"),
        F.sum(F.when(F.col("p_base").isNull(), 1).otherwise(0)).alias(
            "n_new_types"
        ),
        # only types PRESENT in the baseline enter increased/decreased —
        # brand-new types are reported via n_new_types (drift.rs:420-431)
        F.sum(
            F.when(
                F.col("p_base").isNotNull()
                & (F.col("p_cur") - F.col("p_base") > FREQ_CHANGE_THRESHOLD),
                1,
            ).otherwise(0)
        ).alias("n_increased_types"),
        F.sum(
            F.when(
                F.col("p_base").isNotNull()
                & (F.col("p_cur") - F.col("p_base") < -FREQ_CHANGE_THRESHOLD),
                1,
            ).otherwise(0)
        ).alias("n_decreased_types"),
    )
    cb = conf_stats.where(F.col("side") == "base").select(
        F.col("mean_conf").alias("baseline_mean_conf")
    )
    cc = conf_stats.where(F.col("side") == "cur").select(
        F.col("mean_conf").alias("current_mean_conf")
    )
    out = cb.crossJoin(cc).crossJoin(dist).withColumn(
        "drift_amount",
        F.col("current_mean_conf") - F.col("baseline_mean_conf"),
    )
    out = out.withColumn(
        "conf_drift_significant",
        F.abs(F.col("drift_amount")) > confidence_drift_threshold,
    )
    if surface_col:
        vocab_b = tagged.where(F.col("side") == "base").select("surface").distinct()
        vocab_c = tagged.where(F.col("side") == "cur").select("surface").distinct()
        n_cur = vocab_c.count()
        n_new = vocab_c.join(vocab_b, "surface", "left_anti").count()
        out = out.withColumn(
            "new_token_rate",
            F.round(F.lit(n_new / n_cur if n_cur else 0.0), 6),
        )
    for col in (
        "baseline_mean_conf", "current_mean_conf", "drift_amount",
        "kl_divergence",
    ):
        out = out.withColumn(col, F.round(F.col(col), 6))
    cols = [
        "baseline_mean_conf", "current_mean_conf", "drift_amount",
        "conf_drift_significant", "kl_divergence", "n_new_types",
        "n_increased_types", "n_decreased_types",
    ] + (["new_token_rate"] if surface_col else [])
    return out.select(*cols)

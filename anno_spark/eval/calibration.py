"""Confidence-calibration evaluation (reference:
anno/src/eval/calibration.rs:143-260, Guo et al. 2017 arXiv:1706.04599).

Input: a predictions table with a confidence in [0,1] and a correctness
flag. Output: the reliability diagram — one row per non-empty bin —
with the global metrics (ECE / MCE / Brier / confidence gap) attached
as constant columns, so a single driver row carries the whole result.

Everything is two JVM aggregations + one broadcast join: per-bin
groupBy, a single-row global rollup, no Python in the row path. At
10¹² predictions this is one map-side-combined shuffle of ≤num_bins
groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reliability_table(
    preds: DataFrame,
    num_bins: int = 10,
    conf_col: str = "confidence",
    correct_col: str = "correct",
) -> DataFrame:
    """(confidence, correct) rows → per-bin reliability rows with global
    calibration metrics as constant columns.

    Bin rule (calibration.rs:176): ``min(int(conf·num_bins), num_bins-1)``
    — a 1.0 confidence lands in the top bin. Empty bins are omitted
    (calibration.rs:187), matching the reference's reliability_bins.

    Columns: bin, range_start, range_end, count, avg_confidence,
    accuracy, calibration_error + ece, mce, brier_score,
    avg_confidence_correct, avg_confidence_incorrect, confidence_gap,
    total_predictions. ECE = Σ (nᵢ/N)·|accᵢ−confᵢ| (calibration.rs:152);
    Brier = mean((conf−1{correct})²) (calibration.rs:153).
    """
    conf = F.col(conf_col).cast("double")
    ok = F.col(correct_col).cast("boolean").cast("int")
    binned = preds.select(
        conf.alias("conf"),
        ok.alias("ok"),
        F.least(
            F.floor(conf * num_bins).cast("int"), F.lit(num_bins - 1)
        ).alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("count"),
        F.avg("conf").alias("avg_confidence"),
        F.avg("ok").alias("accuracy"),
    )
    per_bin = per_bin.select(
        "bin",
        (F.col("bin").cast("double") / num_bins).alias("range_start"),
        ((F.col("bin") + 1).cast("double") / num_bins).alias("range_end"),
        "count",
        "avg_confidence",
        "accuracy",
        F.abs(F.col("accuracy") - F.col("avg_confidence")).alias(
            "calibration_error"
        ),
    )
    glob = per_bin.agg(
        (
            F.sum(F.col("count") * F.col("calibration_error"))
            / F.sum("count")
        ).alias("ece"),
        F.max("calibration_error").alias("mce"),
        F.sum("count").alias("total_predictions"),
    )
    conf_stats = binned.agg(
        F.avg((F.col("conf") - F.col("ok")) ** 2).alias("brier_score"),
        F.avg(F.when(F.col("ok") == 1, F.col("conf"))).alias(
            "avg_confidence_correct"
        ),
        F.avg(F.when(F.col("ok") == 0, F.col("conf"))).alias(
            "avg_confidence_incorrect"
        ),
    ).select(
        "brier_score",
        # reference returns 0.0 when a side is empty (calibration.rs:236-248)
        F.coalesce("avg_confidence_correct", F.lit(0.0)).alias(
            "avg_confidence_correct"
        ),
        F.coalesce("avg_confidence_incorrect", F.lit(0.0)).alias(
            "avg_confidence_incorrect"
        ),
    )
    glob = glob.crossJoin(conf_stats).withColumn(
        "confidence_gap",
        F.col("avg_confidence_correct") - F.col("avg_confidence_incorrect"),
    )
    out = per_bin.crossJoin(F.broadcast(glob))
    round_cols = (
        "range_start", "range_end", "avg_confidence", "accuracy",
        "calibration_error", "ece", "mce", "brier_score",
        "avg_confidence_correct", "avg_confidence_incorrect",
        "confidence_gap",
    )
    for c in round_cols:
        out = out.withColumn(c, F.round(F.col(c), 6))
    return out.select(
        "bin", "range_start", "range_end", "count", "avg_confidence",
        "accuracy", "calibration_error", "ece", "mce", "brier_score",
        "avg_confidence_correct", "avg_confidence_incorrect",
        "confidence_gap", "total_predictions",
    )


def threshold_metrics(
    preds: DataFrame,
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9),
    conf_col: str = "confidence",
    correct_col: str = "correct",
) -> DataFrame:
    """Per-threshold accuracy/coverage over the predictions kept at
    confidence ≥ t (calibration.rs:246-280): one explode of the
    threshold literals + one groupBy."""
    conf = F.col(conf_col).cast("double")
    ok = F.col(correct_col).cast("boolean").cast("int")
    t = F.explode(F.array(*[F.lit(x) for x in thresholds])).alias("threshold")
    tagged = preds.select(conf.alias("conf"), ok.alias("ok")).select(
        "conf", "ok", t
    )
    n_total = preds.count()
    agg = (
        tagged.where(F.col("conf") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count("*").alias("count"), F.avg("ok").alias("accuracy"))
    )
    return agg.select(
        "threshold",
        F.round("accuracy", 6).alias("accuracy"),
        F.round(F.col("count") / F.lit(max(n_total, 1)), 6).alias("coverage"),
        "count",
    )

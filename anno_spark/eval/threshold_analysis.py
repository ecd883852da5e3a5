"""Confidence-threshold analysis for NER predictions (reference:
anno/src/eval/threshold_analysis.rs:1-435).

Precision/recall/F1 at each of ``num_points + 1`` evenly spaced
confidence thresholds, the F1-optimal operating point, trapezoidal
AUC-PR, and the high-precision / high-recall threshold picks
(ThresholdAnalyzer::analyze, threshold_analysis.rs:130-266).

Distributed shape: the reference filters the full prediction list once
PER threshold (threshold_analysis.rs:202-211 — O(points × n)). The
port makes ONE pass: each prediction computes ``n_ret`` = how many of
the threshold grid values its confidence clears (a codegen'd
array-filter over a literal array — thresholds are monotone, so the
retained sets are nested prefixes), a single groupBy collapses 10^10
predictions to ≤ num_points + 2 rows, and every per-threshold count is
a broadcast rollup of that. Threshold values are computed driver-side
with the same IEEE f64 ``i * (1.0 / num_points)`` the reference uses,
so >= comparisons land identically.

The curve summary (optimal point, AUC-PR, threshold picks) is computed
driver-side over the collected points — config-bounded at
``num_points + 1`` rows, never data-proportional.

Quirks preserved:

* precision at a threshold retaining nothing is 1.0 ("no predictions =
  no false positives"), recall with zero total correct is 1.0
  (threshold_analysis.rs:216-226);
* the optimal point is the LAST maximum in threshold order (Rust
  ``max_by`` keeps the later of equal elements) — ties break toward
  the higher threshold (threshold_analysis.rs:158-168);
* ``high_recall_threshold``'s comment says "lowest" but the code scans
  ``.rev()`` — it is the HIGHEST threshold with recall >= 0.95
  (threshold_analysis.rs:180-186); high_precision is the lowest with
  precision >= 0.95 AND a nonempty retained set (:172-177);
* AUC-PR sorts by recall descending with a STABLE sort, so equal
  recalls keep ascending-threshold order (threshold_analysis.rs:244-259);
* empty input returns the default curve (optimal_threshold 0.5, all
  else 0/None) and NO points (threshold_analysis.rs:131-144);
* ``ThresholdAnalyzer::new`` clamps num_points to >= 5 (:121-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PREDICTION_SCHEMA = (
    "text string, entity_type string, confidence double, is_correct boolean"
)


def predictions_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """PredictionWithConfidence rows (threshold_analysis.rs:33-60)."""
    return spark.createDataFrame(rows, PREDICTION_SCHEMA)


def _grid(num_points: int) -> list[float]:
    step = 1.0 / num_points
    return [i * step for i in range(num_points + 1)]


def threshold_points(preds: DataFrame, num_points: int = 20) -> DataFrame:
    """The ThresholdPoint table (threshold, precision, recall, f1,
    num_predictions, num_correct), ascending threshold
    (threshold_analysis.rs:146-156, 202-242). Empty input yields zero
    rows (the reference's empty-curve branch)."""
    num_points = max(num_points, 5)
    ts = _grid(num_points)
    spark = preds.sparkSession

    arr = F.array(*[F.lit(t) for t in ts])
    nret = preds.select(
        F.size(F.filter(arr, lambda t: F.col("confidence") >= t)).alias("n_ret"),
        F.col("is_correct").cast("int").alias("c"),
    )
    agg = nret.groupBy("n_ret").agg(
        F.count("*").alias("n"), F.sum("c").alias("nc")
    )
    totals = agg.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("_total_n"),
        F.coalesce(F.sum("nc"), F.lit(0)).alias("_total_correct"),
    )

    pts = spark.createDataFrame(
        list(enumerate(ts)), "idx int, threshold double"
    )
    # retained at point idx  <=>  confidence >= ts[idx]  <=>  n_ret > idx
    # (the grid is monotone, so retained sets are nested prefixes)
    counts = (
        pts.join(F.broadcast(agg), F.col("n_ret") > F.col("idx"), "left")
        .groupBy("idx", "threshold")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("num_predictions"),
            F.coalesce(F.sum("nc"), F.lit(0)).alias("num_correct"),
        )
        .crossJoin(F.broadcast(totals))
        .where(F.col("_total_n") > 0)
    )

    precision = F.when(F.col("num_predictions") == 0, F.lit(1.0)).otherwise(
        F.col("num_correct") / F.col("num_predictions")
    )
    recall = F.when(F.col("_total_correct") == 0, F.lit(1.0)).otherwise(
        F.col("num_correct") / F.col("_total_correct")
    )
    return (
        counts.withColumns({"precision": precision, "recall": recall})
        .withColumn(
            "f1",
            F.when(F.col("precision") + F.col("recall") == 0.0, F.lit(0.0)).otherwise(
                2.0
                * F.col("precision")
                * F.col("recall")
                / (F.col("precision") + F.col("recall"))
            ),
        )
        .orderBy("idx")
        .select(
            "threshold", "precision", "recall", "f1",
            "num_predictions", "num_correct",
        )
    )


_CURVE_SCHEMA = (
    "optimal_threshold double, optimal_f1 double, optimal_precision double,"
    " optimal_recall double, auc_pr double, total_predictions long,"
    " total_correct long, high_precision_threshold double,"
    " high_recall_threshold double"
)


def threshold_curve(preds: DataFrame, num_points: int = 20) -> DataFrame:
    """ONE-row ThresholdCurve summary (threshold_analysis.rs:81-199).
    Collects the config-bounded points table and applies the
    reference's selection rules verbatim driver-side."""
    spark = preds.sparkSession
    points = threshold_points(preds, num_points).collect()
    if not points:
        return spark.createDataFrame(
            [(0.5, 0.0, 0.0, 0.0, 0.0, 0, 0, None, None)], _CURVE_SCHEMA
        )

    # predictions.len() / total correct at threshold 0 — counted over the
    # full frame, not points[0], so a (malformed) negative confidence
    # still lands in the totals exactly as in the reference
    tot = preds.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.col("is_correct").cast("int")), F.lit(0)).alias("nc"),
    ).collect()[0]
    total_predictions, total_correct = tot.n, tot.nc

    optimal = points[0]
    for p in points:  # max_by: later of equal f1 wins
        if p.f1 >= optimal.f1:
            optimal = p

    # stable sort by recall desc keeps ascending-threshold order on ties
    by_recall = sorted(points, key=lambda p: -p.recall)
    auc = 0.0
    if len(by_recall) >= 2:
        for a, b in zip(by_recall, by_recall[1:]):
            auc += (a.recall - b.recall) * (a.precision + b.precision) / 2.0

    high_p = next(
        (p.threshold for p in points if p.precision >= 0.95 and p.num_predictions > 0),
        None,
    )
    high_r = next(
        (p.threshold for p in reversed(points) if p.recall >= 0.95), None
    )

    return spark.createDataFrame(
        [(
            optimal.threshold, optimal.f1, optimal.precision, optimal.recall,
            auc, total_predictions, total_correct, high_p, high_r,
        )],
        _CURVE_SCHEMA,
    )


def format_threshold_table(points, curve) -> str:
    """format_threshold_table (threshold_analysis.rs:273-306) over
    collected rows."""
    out = "Threshold   Precision   Recall      F1    Predictions\n"
    out += "--------------------------------------------------------\n"
    for p in points:
        out += (
            f"   {p.threshold:.2f}       {p.precision * 100.0:5.1f}%    "
            f"{p.recall * 100.0:5.1f}%    {p.f1 * 100.0:5.1f}%      "
            f"{p.num_predictions:4}\n"
        )
    out += "--------------------------------------------------------\n"
    out += (
        f"Optimal: threshold={curve.optimal_threshold:.2f}, "
        f"F1={curve.optimal_f1 * 100.0:.1f}%, "
        f"P={curve.optimal_precision * 100.0:.1f}%, "
        f"R={curve.optimal_recall * 100.0:.1f}%\n"
    )
    out += f"AUC-PR: {curve.auc_pr:.3f}\n"
    if curve.high_precision_threshold is not None:
        out += (
            "High-precision (>=95%) threshold: "
            f"{curve.high_precision_threshold:.2f}\n"
        )
    if curve.high_recall_threshold is not None:
        out += (
            f"High-recall (>=95%) threshold: {curve.high_recall_threshold:.2f}\n"
        )
    return out


def interpret_curve(curve) -> list[str]:
    """interpret_curve (threshold_analysis.rs:309-349) over the
    collected one-row summary."""
    insights = []
    if curve.auc_pr >= 0.9:
        insights.append("Excellent calibration (AUC-PR >= 0.9)")
    elif curve.auc_pr >= 0.7:
        insights.append("Good calibration (AUC-PR >= 0.7)")
    elif curve.auc_pr >= 0.5:
        insights.append("Moderate calibration (AUC-PR >= 0.5)")
    else:
        insights.append(
            "Poor calibration (AUC-PR < 0.5) - confidence scores unreliable"
        )

    if curve.optimal_threshold < 0.3:
        insights.append("Low optimal threshold suggests model is underconfident")
    elif curve.optimal_threshold > 0.7:
        insights.append("High optimal threshold suggests model tends to overpredict")

    if curve.optimal_precision > 0.9 and curve.optimal_recall < 0.7:
        insights.append(
            "High precision but low recall - consider lowering threshold"
        )
    elif curve.optimal_recall > 0.9 and curve.optimal_precision < 0.7:
        insights.append(
            "High recall but low precision - consider raising threshold"
        )

    if curve.high_precision_threshold is not None:
        insights.append("Can achieve 95%+ precision with threshold tuning")
    else:
        insights.append("Cannot achieve 95% precision at any threshold")

    return insights

"""Learning-curve analysis (reference:
anno/src/eval/learning_curve.rs:1-574).

Sample-efficiency metrics over (train_size, P/R/F1) points: F1 per 100
samples, target extrapolation via a heuristic power-law fit
(y = a·x^b + c), diminishing-returns detection, saturation level, and
recommendations (LearningCurveAnalyzer::analyze,
learning_curve.rs:120-355).

Split of labor: the curve MATH is pure python transcribed 1:1 — it
operates on a config-bounded point list (≤ ~15 rows), never on
data-proportional input. The Spark piece is :func:`learning_curve_points`,
the feeder that produces those points from full prediction/gold tables:
nested hash-prefix case subsets (same xxhash64 ordering as
eval/sampling.py, so size-s ⊂ size-s') evaluated in ONE pass — per-case
match counts once, then a broadcast range join against the sizes grid;
a TakeOrdered limit to max(sizes) bounds the ranking window, so no
global sort materializes at corpus scale.

Adaptation note: this engine is rule-based — there is no training
loop. The feeder's ``train_size`` is the evaluated-corpus prefix size
(how metrics move/stabilize with data volume); the reference's
analyzer is equally agnostic about where its DataPoints came from
(LearningCurveAnalyzer::new just consumes them,
learning_curve.rs:103-109).

Quirks preserved:

* the power-law R² scores residuals of ``a·x^b`` WITHOUT the +c offset
  the params carry (learning_curve.rs:283-295), clamped to >= 0;
* c is last-point F1 × 1.05 capped at 1.0 — not fit
  (learning_curve.rs:279-281);
* target estimation returns the FIRST achieving point's size, else
  extrapolates only with >= 3 points, truncating x to int
  (learning_curve.rs:175-201);
* saturation thirds use integer division; zero/negative initial
  improvement saturates to 1.0 (learning_curve.rs:226-248);
* ``suggested_train_sizes`` multiplies by 2.5 with truncation —
  10, 25, 62, 155, … — and force-appends max_size
  (learning_curve.rs:381-398).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class DataPoint:
    """learning_curve.rs:39-49."""

    train_size: int
    f1: float
    precision: float
    recall: float


@dataclass
class CurveFitParams:
    """Power law y = a·x^b + c (learning_curve.rs:80-91)."""

    a: float
    b: float
    c: float
    r_squared: float


@dataclass
class SampleEfficiencyMetrics:
    """learning_curve.rs:66-77."""

    f1_per_100_samples: float
    samples_for_targets: dict[str, int | None]
    diminishing_returns_threshold: int | None
    saturation_level: float


@dataclass
class LearningCurveAnalysis:
    """learning_curve.rs:52-63 (per-entity curves omitted here; run
    the analyzer per type over ner_prf_by_type_df feeds)."""

    data_points: list[DataPoint]
    efficiency: SampleEfficiencyMetrics
    curve_fit: CurveFitParams | None
    recommendations: list[str] = field(default_factory=list)

    def samples_for_target(self, target_f1: float) -> int | None:
        """learning_curve.rs:359-366."""
        return self.efficiency.samples_for_targets.get(
            f"{target_f1 * 100:.0f}%"
        )

    def more_data_would_help(self) -> bool:
        """learning_curve.rs:369-371."""
        return self.efficiency.saturation_level < 0.7


def fit_power_law(points: list[DataPoint]) -> CurveFitParams | None:
    """fit_power_law (learning_curve.rs:251-310): least squares of f1
    on ln(train_size) for (a, b); c heuristic; R² against a·x^b."""
    import math

    if len(points) < 3:
        return None
    pts = sorted(points, key=lambda p: p.train_size)
    x_log = [math.log(p.train_size) for p in pts]
    y = [p.f1 for p in pts]
    n = float(len(x_log))
    sum_x = sum(x_log)
    sum_y = sum(y)
    sum_xy = sum(x * yi for x, yi in zip(x_log, y))
    sum_x2 = sum(x * x for x in x_log)
    denom = n * sum_x2 - sum_x * sum_x
    if abs(denom) < 1e-10:
        return None
    b = (n * sum_xy - sum_x * sum_y) / denom
    a = math.exp((sum_y - b * sum_x) / n)
    c = min(pts[-1].f1 * 1.05, 1.0)
    y_mean = sum_y / n
    ss_tot = sum((yi - y_mean) ** 2 for yi in y)
    ss_res = sum((p.f1 - a * p.train_size**b) ** 2 for p in pts)
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0.0 else 0.0
    return CurveFitParams(a, b, c, max(r2, 0.0))


def estimate_samples_for_f1(
    points: list[DataPoint], target_f1: float
) -> int | None:
    """learning_curve.rs:175-201."""
    pts = sorted(points, key=lambda p: p.train_size)
    for p in pts:
        if p.f1 >= target_f1:
            return p.train_size
    if len(pts) >= 3:
        fit = fit_power_law(pts)
        if fit is not None:
            diff = target_f1 - fit.c
            if diff > 0.0 and fit.a > 0.0 and fit.b != 0.0:
                import math

                x = (diff / fit.a) ** (1.0 / fit.b)
                if math.isfinite(x) and x > 0.0:
                    return int(x)
    return None


def _find_diminishing_returns(pts: list[DataPoint]) -> int | None:
    """learning_curve.rs:204-224: first >=1.5× size step improving F1
    by < 1% — returns the PREVIOUS size."""
    if len(pts) < 3:
        return None
    for prev, curr in zip(pts, pts[1:]):
        ratio = curr.train_size / prev.train_size
        if ratio >= 1.5 and curr.f1 - prev.f1 < 0.01:
            return prev.train_size
    return None


def _compute_saturation(pts: list[DataPoint]) -> float:
    """learning_curve.rs:226-248."""
    if len(pts) < 3:
        return 0.0
    first_third_end = len(pts) // 3
    last_third_start = len(pts) * 2 // 3
    if first_third_end == 0 or last_third_start >= len(pts):
        return 0.0
    initial = pts[first_third_end].f1 - pts[0].f1
    recent = pts[-1].f1 - pts[last_third_start].f1
    if initial <= 0.0:
        return 1.0
    return min(max(1.0 - min(recent / initial, 1.0), 0.0), 1.0)


def analyze(points: list[DataPoint]) -> LearningCurveAnalysis:
    """LearningCurveAnalyzer::analyze (learning_curve.rs:120-172,
    333-355)."""
    pts = sorted(points, key=lambda p: p.train_size)

    if len(pts) < 2:
        f1_per_100 = 0.0
    else:
        sample_diff = pts[-1].train_size - pts[0].train_size
        f1_per_100 = (
            0.0
            if sample_diff == 0
            else (pts[-1].f1 - pts[0].f1) / sample_diff * 100.0
        )

    samples_for_targets = {
        f"{t * 100:.0f}%": estimate_samples_for_f1(points, t)
        for t in (0.80, 0.85, 0.90, 0.95)
    }
    efficiency = SampleEfficiencyMetrics(
        f1_per_100_samples=f1_per_100,
        samples_for_targets=samples_for_targets,
        diminishing_returns_threshold=_find_diminishing_returns(pts),
        saturation_level=_compute_saturation(pts),
    )

    recs = []
    if efficiency.saturation_level > 0.8:
        recs.append(
            "Model appears saturated - consider architectural changes"
            " rather than more data"
        )
    elif efficiency.saturation_level > 0.5:
        recs.append(
            "Approaching saturation - additional data will have"
            " diminishing returns"
        )
    else:
        recs.append(
            "Model not saturated - more training data likely to improve"
            " performance"
        )
    if efficiency.f1_per_100_samples < 0.001:
        recs.append(
            "Very low data efficiency - check for data quality issues or"
            " model capacity"
        )
    elif efficiency.f1_per_100_samples > 0.05:
        recs.append(
            "High data efficiency - model is learning effectively from"
            " limited data"
        )
    s90 = efficiency.samples_for_targets.get("90%")
    if s90 is not None:
        recs.append(f"Estimated ~{s90} samples needed to reach 90% F1")

    return LearningCurveAnalysis(
        data_points=list(points),
        efficiency=efficiency,
        curve_fit=fit_power_law(points),
        recommendations=recs,
    )


def suggested_train_sizes(max_size: int) -> list[int]:
    """learning_curve.rs:381-398: ×2.5 truncated from 10, max
    force-appended."""
    sizes = []
    size = 10
    while size <= max_size:
        sizes.append(size)
        size = int(size * 2.5)
    if not sizes or sizes[-1] != max_size:
        sizes.append(max_size)
    return sizes


def learning_curve_points(
    pred: DataFrame,
    gold: DataFrame,
    sizes: list[int],
    seed: int = 42,
    id_col: str = "url",
) -> DataFrame:
    """The Spark feeder: exact-mode PRF (the eval/ner_eval.py multiset
    matching on (url, start, end, entity_type)) at each nested
    hash-prefix subset of cases, ONE pass over the data. Output rows
    (train_size, precision, recall, f1, n_pred, n_gold, n_matched)
    ascending — ready for :func:`analyze` via ``as_data_points``."""
    key = [id_col, "start", "end", "entity_type"]
    pk = pred.groupBy(*key).agg(F.count("*").alias("n_pred"))
    gk = gold.groupBy(*key).agg(F.count("*").alias("n_gold"))
    per_case = (
        pk.join(gk, key, "full_outer")
        .select(
            F.col(id_col),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
        )
        .withColumn("n_matched", F.least("n_pred", "n_gold"))
        .groupBy(id_col)
        .agg(
            F.sum("n_pred").alias("n_pred"),
            F.sum("n_gold").alias("n_gold"),
            F.sum("n_matched").alias("n_matched"),
        )
    )

    max_size = max(sizes)
    ranked = (
        per_case.withColumn("_h", F.xxhash64(F.lit(seed), F.col(id_col)))
        .orderBy("_h", id_col)
        .limit(max_size)  # TakeOrdered heap: bounds the window below
        .withColumn(
            "_rn", F.row_number().over(Window.orderBy("_h", F.col(id_col)))
        )
    )
    sizes_df = per_case.sparkSession.createDataFrame(
        [(int(s),) for s in sorted(set(sizes))], "train_size long"
    )
    agg = (
        ranked.join(F.broadcast(sizes_df), F.col("_rn") <= F.col("train_size"))
        .groupBy("train_size")
        .agg(
            F.sum("n_pred").alias("n_pred"),
            F.sum("n_gold").alias("n_gold"),
            F.sum("n_matched").alias("n_matched"),
        )
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    r = F.when(F.col("n_gold") > 0, F.col("n_matched") / F.col("n_gold")).otherwise(0.0)
    return agg.select(
        "train_size",
        p.alias("precision"),
        r.alias("recall"),
        F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0).alias("f1"),
        "n_pred", "n_gold", "n_matched",
    ).orderBy("train_size")


def as_data_points(points_df: DataFrame) -> list[DataPoint]:
    """Collect a feeder output (≤ len(sizes) rows) into DataPoints."""
    return [
        DataPoint(
            train_size=int(r.train_size), f1=r.f1,
            precision=r.precision, recall=r.recall,
        )
        for r in points_df.collect()
    ]

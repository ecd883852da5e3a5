"""Long-tail entity-type analysis (reference:
anno/src/eval/long_tail.rs:1-527).

Aggregate F1 masks minority-class failure; the reference buckets
entity types into Head / Mid / Tail by gold frequency (top / middle /
bottom ``tail_percentile`` of TYPES, not of mass — long_tail.rs:177-180)
and reports per-bucket F1, the head-tail gap, a Gini coefficient of
per-type F1 (pairwise |Δ| formula, long_tail.rs:382-403), struggling
(F1 < 0.5) and failed (F1 < 0.01, long_tail.rs:324-326) counts, and
rule-based insight strings (long_tail.rs:328-366).

Distributed shape: the input is a per-type metrics table — cardinality
= the type vocabulary, tiny by construction — produced relationally at
any corpus size by :func:`anno_spark.eval.ner_eval.ner_prf_by_type_df`
(one groupBy over the mention tables). Bucketing is one row_number
window over that tiny frame; the Gini's O(n²) pairwise sum is a
self-crossJoin of the same frame (n = #types, never #mentions).

Determinism choices where the reference is unspecified:

* the reference sorts by count descending with Rust's stable sort, so
  equal counts keep caller order (long_tail.rs:171-172); a DataFrame
  has no caller order, so ties break by entity_type ascending;
* the "tail types struggling" insight lists the first 3 tail types in
  per_type input order (long_tail.rs:351-356); the port lists them in
  rank order (count desc, type asc).

Quirks preserved:

* head_cutoff = ceil(n·pct) and tail_cutoff = n − head_cutoff with
  head checked FIRST, so when buckets would overlap (small n) head
  wins — a single type lands in Head, never Tail (long_tail.rs:177-199);
* empty buckets average to 0.0, making head_tail_gap NEGATIVE when
  head exists and tail is empty-F1 (long_tail.rs:295-318);
* ``failed_types`` counts F1 < 0.01 though the display string says
  "F1=0%" (long_tail.rs:325-326, 434);
* Gini returns 0.0 when the mean F1 < 1e-10 (long_tail.rs:389-391);
* ``tail_percentile`` is clamped to [0.05, 0.4] (long_tail.rs:151-154).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TAIL_PERCENTILE = 0.2  # long_tail.rs:142-145


def _clamp(pct: float) -> float:
    return min(max(pct, 0.05), 0.4)


def bucket_by_frequency(
    per_type: DataFrame, tail_percentile: float = DEFAULT_TAIL_PERCENTILE
) -> DataFrame:
    """split_by_frequency / classify_type (long_tail.rs:156-241): adds
    a ``bucket`` column (Head/Mid/Tail) to a per-type frame that has at
    least (entity_type, count)."""
    pct = _clamp(tail_percentile)
    w = Window.orderBy(F.desc("count"), F.asc("entity_type"))
    ranked = per_type.withColumn("_i", F.row_number().over(w) - 1).withColumn(
        "_n", F.count("*").over(Window.partitionBy())
    )
    head_cutoff = F.ceil(F.col("_n") * F.lit(pct))
    tail_cutoff = F.col("_n") - head_cutoff
    return ranked.withColumn(
        "bucket",
        F.when(F.col("_i") < head_cutoff, "Head")
        .when(F.col("_i") >= tail_cutoff, "Tail")
        .otherwise("Mid"),
    ).drop("_i", "_n")


def frequency_split(
    per_type: DataFrame, tail_percentile: float = DEFAULT_TAIL_PERCENTILE
) -> DataFrame:
    """One row per bucket: member types (rank order) and coverage —
    the bucket's share of total gold entities (long_tail.rs:201-223)."""
    b = bucket_by_frequency(per_type, tail_percentile)
    tot = Window.partitionBy()
    return (
        b.withColumn("_tot", F.sum("count").over(tot))
        .groupBy("bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.negate(F.col("count")), "entity_type"))
            )["entity_type"].alias("types"),
            F.coalesce(
                F.sum("count") / F.max("_tot"), F.lit(0.0)
            ).alias("coverage"),
        )
    )


def long_tail_report(
    per_type: DataFrame, tail_percentile: float = DEFAULT_TAIL_PERCENTILE
) -> tuple[DataFrame, DataFrame]:
    """LongTailAnalyzer::analyze (long_tail.rs:243-380).

    ``per_type``: (entity_type, count, precision, recall, f1) — e.g.
    from :func:`anno_spark.eval.ner_eval.ner_prf_by_type_df`.

    Returns ``(per_type_with_bucket, summary)``; summary is ONE row:
    head_f1, mid_f1, tail_f1, head_tail_gap, gini_coefficient,
    struggling_types, failed_types, n_types, tail_coverage — zeros on
    empty input (long_tail.rs:246-259).
    """
    b = bucket_by_frequency(per_type, tail_percentile)

    stats = b.agg(
        F.coalesce(F.avg(F.when(F.col("bucket") == "Head", F.col("f1"))), F.lit(0.0))
        .alias("head_f1"),
        F.coalesce(F.avg(F.when(F.col("bucket") == "Mid", F.col("f1"))), F.lit(0.0))
        .alias("mid_f1"),
        F.coalesce(F.avg(F.when(F.col("bucket") == "Tail", F.col("f1"))), F.lit(0.0))
        .alias("tail_f1"),
        F.count("*").alias("n_types"),
        F.coalesce(F.sum(F.when(F.col("f1") < 0.5, 1).otherwise(0)), F.lit(0))
        .alias("struggling_types"),
        F.coalesce(F.sum(F.when(F.col("f1") < 0.01, 1).otherwise(0)), F.lit(0))
        .alias("failed_types"),
        F.coalesce(F.avg("f1"), F.lit(0.0)).alias("_mean_f1"),
        F.coalesce(
            F.sum(F.when(F.col("bucket") == "Tail", F.col("count")).otherwise(0))
            / F.sum("count"),
            F.lit(0.0),
        ).alias("tail_coverage"),
    )

    # Gini of per-type F1: Σᵢⱼ|f1ᵢ−f1ⱼ| / (2·n²·mean) — n = #types only
    pairs = (
        b.select(F.col("f1").alias("_a"))
        .crossJoin(b.select(F.col("f1").alias("_c")))
        .agg(F.coalesce(F.sum(F.abs(F.col("_a") - F.col("_c"))), F.lit(0.0))
             .alias("_absdiff"))
    )
    summary = stats.crossJoin(pairs).select(
        "head_f1",
        "mid_f1",
        "tail_f1",
        (F.col("head_f1") - F.col("tail_f1")).alias("head_tail_gap"),
        F.when(
            (F.col("_mean_f1") < 1e-10) | (F.col("n_types") == 0), F.lit(0.0)
        )
        .otherwise(
            F.col("_absdiff")
            / (2.0 * F.col("n_types") * F.col("n_types") * F.col("_mean_f1"))
        )
        .alias("gini_coefficient"),
        "struggling_types",
        "failed_types",
        "n_types",
        "tail_coverage",
    )
    return b, summary


def insights(summary_row, tail_types: list[str]) -> list[str]:
    """The rule-based insight strings (long_tail.rs:328-366), exact
    format strings. ``summary_row``: one collected row of
    :func:`long_tail_report`'s summary; ``tail_types``: Tail-bucket
    type names in rank order."""
    s = summary_row
    if s["n_types"] == 0:
        return ["No entity types to analyze"]
    out: list[str] = []
    gap = s["head_tail_gap"]
    if gap > 0.3:
        out.append(
            f"Large head-tail gap ({gap * 100.0:.0f}%): "
            "tail types severely underperforming"
        )
    elif gap < 0.1:
        out.append(
            "Low head-tail gap: relatively uniform performance across types"
        )
    if s["gini_coefficient"] > 0.4:
        out.append(
            f"High inequality (Gini={s['gini_coefficient']:.2f}): "
            "performance very uneven across types"
        )
    if s["failed_types"] > 0:
        out.append(f"{s['failed_types']} entity types completely failed (F1=0%)")
    if tail_types and s["tail_f1"] < 0.3:
        shown = [repr(t).replace("'", '"') for t in tail_types[:3]]
        out.append("Tail types struggling: [" + ", ".join(shown) + "]")
    if 0.0 < s["tail_coverage"] < 0.1:
        out.append(
            f"Tail types represent only {s['tail_coverage'] * 100.0:.1f}% "
            "of data - may need upsampling"
        )
    return out


def format_long_tail_results(summary_row, insight_lines: list[str]) -> str:
    """format_long_tail_results (long_tail.rs:405-447), exact layout."""
    s = summary_row
    out = [
        "Long-Tail Analysis:",
        f"  Head F1: {s['head_f1'] * 100.0:.1f}%",
        f"  Mid F1:  {s['mid_f1'] * 100.0:.1f}%",
        f"  Tail F1: {s['tail_f1'] * 100.0:.1f}%",
        f"  Head-Tail Gap: {s['head_tail_gap'] * 100.0:.1f}%",
        f"  Gini Coefficient: {s['gini_coefficient']:.3f}",
        f"  Struggling types (F1<50%): {s['struggling_types']}",
        f"  Failed types (F1=0%): {s['failed_types']}",
    ]
    text = "\n".join(out) + "\n"
    if insight_lines:
        text += "\nInsights:\n"
        for line in insight_lines:
            text += f"  - {line}\n"
    return text

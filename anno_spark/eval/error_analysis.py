"""NER error categorization (reference:
anno/src/eval/error_analysis.rs:131-475).

Five categories over greedy best-match per document
(error_analysis.rs:243-420): exact boundary + wrong type → type_error;
type match + inexact boundary → boundary_error; overlapping + both
wrong → partial_match; unmatched prediction → false_positive; unmatched
gold → false_negative. Candidate matches must exceed a span-Jaccard
overlap threshold (default 0.5, error_analysis.rs:225-231); the
dominance rule prefers exact boundaries, then type agreement, then
overlap (error_analysis.rs:283-301).

The matcher is per-document and order-dependent (gold processed in
input order, each consuming at most one prediction), so it runs as the
pure-Python payload of a cogrouped applyInPandas — one group per url,
the same distribution contract as the extraction core — and the
category rollup is a plain relational aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CATEGORIES = (
    "boundary_error", "type_error", "false_positive",
    "false_negative", "partial_match",
)

ERROR_SCHEMA = (
    "url string, category string, pred_text string, pred_type string, "
    "pred_start int, pred_end int, gold_text string, gold_type string, "
    "gold_start int, gold_end int"
)


def span_overlap(p_start: int, p_end: int, g_start: int, g_end: int) -> float:
    """Span Jaccard (error_analysis.rs:460-475)."""
    lo, hi = max(p_start, g_start), min(p_end, g_end)
    if lo >= hi:
        return 0.0
    inter = hi - lo
    union = (p_end - p_start) + (g_end - g_start) - inter
    return inter / union if union else 0.0


def categorize_errors(
    preds: list[tuple],
    golds: list[tuple],
    overlap_threshold: float = 0.5,
) -> list[tuple]:
    """preds/golds: (text, entity_type, start, end) per document →
    error rows (category, pred..., gold...); correct predictions emit
    nothing (error_analysis.rs:340 'not an error')."""
    matched_p = [False] * len(preds)
    matched_g = [False] * len(golds)
    out = []
    for gi, (g_text, g_type, g_start, g_end) in enumerate(golds):
        best = None  # (pi, overlap, exact_boundary, type_match)
        for pi, (p_text, p_type, p_start, p_end) in enumerate(preds):
            if matched_p[pi]:
                continue
            if not (p_start < g_end and p_end > g_start):
                continue
            exact = p_start == g_start and p_end == g_end
            tmatch = p_type == g_type
            ov = span_overlap(p_start, p_end, g_start, g_end)
            # dominance: exact > type > overlap (error_analysis.rs:283-301)
            if best is not None:
                _, b_ov, b_exact, b_tmatch = best
                if (not exact and b_exact) or (
                    exact == b_exact
                    and ((not tmatch and b_tmatch)
                         or (tmatch == b_tmatch and ov <= b_ov))
                ):
                    continue
            if ov > overlap_threshold:
                best = (pi, ov, exact, tmatch)
        if best is None:
            continue
        pi, _, exact, tmatch = best
        matched_p[pi] = True
        matched_g[gi] = True
        if exact and tmatch:
            continue  # correct
        category = (
            "type_error" if exact
            else ("boundary_error" if tmatch else "partial_match")
        )
        p_text, p_type, p_start, p_end = preds[pi]
        out.append((category, p_text, p_type, p_start, p_end,
                    g_text, g_type, g_start, g_end))
    for pi, (p_text, p_type, p_start, p_end) in enumerate(preds):
        if not matched_p[pi]:
            out.append(("false_positive", p_text, p_type, p_start, p_end,
                        None, None, None, None))
    for gi, (g_text, g_type, g_start, g_end) in enumerate(golds):
        if not matched_g[gi]:
            out.append(("false_negative", None, None, None, None,
                        g_text, g_type, g_start, g_end))
    return out


def error_instances(
    pred_df: DataFrame,
    gold_df: DataFrame,
    overlap_threshold: float = 0.5,
) -> DataFrame:
    """Distributed per-document error analysis: cogroup pred/gold by url
    → one matcher call per document. Both inputs:
    (url, text, entity_type, start, end); preds and golds keep their
    within-document input order via the (start, end) sort — the matcher
    is order-dependent, and a deterministic order makes the output
    reproducible at any parallelism."""
    import pandas as pd

    def run(key, pred_pdf: "pd.DataFrame", gold_pdf: "pd.DataFrame"):
        url = key[0]
        preds = [
            (r.text, r.entity_type, int(r.start), int(r.end))
            for r in pred_pdf.sort_values(["start", "end"]).itertuples()
        ]
        golds = [
            (r.text, r.entity_type, int(r.start), int(r.end))
            for r in gold_pdf.sort_values(["start", "end"]).itertuples()
        ]
        rows = categorize_errors(preds, golds, overlap_threshold)
        return pd.DataFrame(
            [(url, *r) for r in rows],
            columns=["url", "category", "pred_text", "pred_type",
                     "pred_start", "pred_end", "gold_text", "gold_type",
                     "gold_start", "gold_end"],
        )

    cols = ["url", "text", "entity_type", "start", "end"]
    return (
        pred_df.select(*cols)
        .groupBy("url")
        .cogroup(gold_df.select(*cols).groupBy("url"))
        .applyInPandas(run, schema=ERROR_SCHEMA)
    )


def error_summary(instances: DataFrame) -> DataFrame:
    """Category counts + rates over total errors
    (error_analysis.rs:416-442); zero-count categories included so the
    output schema is fixed."""
    spark = instances.sparkSession
    cats = spark.createDataFrame([(c,) for c in CATEGORIES], "category string")
    counts = instances.groupBy("category").agg(F.count("*").alias("n"))
    full = cats.join(counts, "category", "left").select(
        "category", F.coalesce("n", F.lit(0)).alias("n")
    )
    total = full.agg(F.sum("n").alias("total"))
    return (
        full.crossJoin(F.broadcast(total))
        .select(
            "category",
            "n",
            F.round(
                F.when(F.col("total") > 0, F.col("n") / F.col("total"))
                .otherwise(0.0),
                6,
            ).alias("rate"),
        )
    )

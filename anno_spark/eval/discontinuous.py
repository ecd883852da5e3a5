"""Discontinuous-NER evaluation (reference:
anno/src/eval/discontinuous.rs:38-473).

CADEC-style entities span non-adjacent ranges ("severe pain ... in
legs"). The reference scores predictions against gold at three
strictnesses (evaluate_discontinuous_ner, discontinuous.rs:195-407):

* exact — the full span SET matches (order-insensitive, :408-421);
* entity boundary — only the bounding range (min start, max end)
  matches (:422-447);
* partial — best char-level IoU across all spans, summed per side and
  divided by side counts (:448-462 + :288-310).

Matching is greedy in iteration order with one-to-one consumption
(each gold/pred matches at most once, :241-285). For exact and
boundary matching that greediness is equivalent to per-equivalence-
class min-multiplicity, so totals are order-independent; the port
keeps the transcribed greedy loop for bit-parity anyway.

Distributed shape: matching is per-DOCUMENT work over entity lists
that are tiny (O(entities²) within one doc), so the transcribed
matcher runs inside ``cogroup().applyInPandas`` — one task per url
batch, horizontal at any corpus size — and every global / per-type
metric afterward is a map-side-combinable aggregation over the per-
(url, type) count rows.

Quirks preserved:

* both-empty input returns all metrics = 1.0 (:200-217);
* empty-side precision/recall are 0.0, F1 0.0 (:316-352);
* per-type rows exist for types seen on EITHER side (:228-238);
* ``calculate_multi_span_overlap`` of two empty span sets is 1.0
  (:457-459);
* ``overlap_threshold`` sits in the config but the reference never
  consults it when scoring (partial sums use raw best-IoU) — the port
  carries the field and ignores it identically.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pure port (drives unit parity + the per-document worker)


def is_contiguous(spans: Iterable) -> bool:
    """DiscontinuousGold::is_contiguous (discontinuous.rs:76-79)."""
    return len(list(spans)) == 1


def bounding_range(spans: Iterable) -> tuple | None:
    """DiscontinuousGold::bounding_range (:81-86)."""
    spans = list(spans)
    if not spans:
        return None
    return (min(s for s, _ in spans), max(e for _, e in spans))


def total_length(spans: Iterable) -> int:
    """DiscontinuousGold::total_length (:88-91)."""
    return sum(e - s for s, e in spans)


def spans_match_exactly(a: list, b: list) -> bool:
    """discontinuous.rs:408-421 — sorted span sets equal."""
    if len(a) != len(b):
        return False
    return sorted(map(tuple, a)) == sorted(map(tuple, b))


def boundaries_match(a: list, b: list) -> bool:
    """discontinuous.rs:422-447 — (min start, max end) equal."""
    if not a and not b:
        return True
    if not a or not b:
        return False
    return bounding_range(a) == bounding_range(b)


def multi_span_overlap(a: list, b: list) -> float:
    """discontinuous.rs:448-462 — char-set IoU; both-empty → 1.0."""
    a_chars = {c for s, e in a for c in range(s, e)}
    b_chars = {c for s, e in b for c in range(s, e)}
    union = len(a_chars | b_chars)
    if union == 0:
        return 1.0
    return len(a_chars & b_chars) / union


def f1_score(precision: float, recall: float) -> float:
    if precision + recall > 0.0:
        return 2.0 * precision * recall / (precision + recall)
    return 0.0


def _match_counts(gold: list, pred: list, require_type_match: bool) -> dict:
    """The matching core of evaluate_discontinuous_ner (:219-310):
    greedy exact + boundary matching and partial-overlap sums, with
    per-type stats (gold_count, pred_count, exact, boundary) keyed by
    the GOLD entity's type for matches. gold/pred items are dicts with
    "spans" (list of [s, e]) and "entity_type"."""
    type_stats: dict = {}
    for g in gold:
        type_stats.setdefault(g["entity_type"], [0, 0, 0, 0])[0] += 1
    for p in pred:
        type_stats.setdefault(p["entity_type"], [0, 0, 0, 0])[1] += 1

    gold_matched_exact = [False] * len(gold)
    gold_matched_boundary = [False] * len(gold)
    exact_matches = boundary_matches = 0

    for p in pred:
        for gi, g in enumerate(gold):
            if gold_matched_exact[gi]:
                continue
            if require_type_match and p["entity_type"] != g["entity_type"]:
                continue
            if spans_match_exactly(p["spans"], g["spans"]):
                gold_matched_exact[gi] = True
                exact_matches += 1
                type_stats.setdefault(g["entity_type"], [0, 0, 0, 0])[2] += 1
                break

    for p in pred:
        for gi, g in enumerate(gold):
            if gold_matched_boundary[gi]:
                continue
            if require_type_match and p["entity_type"] != g["entity_type"]:
                continue
            if boundaries_match(p["spans"], g["spans"]):
                gold_matched_boundary[gi] = True
                boundary_matches += 1
                type_stats.setdefault(g["entity_type"], [0, 0, 0, 0])[3] += 1
                break

    partial_precision_sum = 0.0
    for p in pred:
        best = max(
            (multi_span_overlap(p["spans"], g["spans"]) for g in gold
             if not require_type_match or p["entity_type"] == g["entity_type"]),
            default=0.0)
        partial_precision_sum += best
    partial_recall_sum = 0.0
    for g in gold:
        best = max(
            (multi_span_overlap(p["spans"], g["spans"]) for p in pred
             if not require_type_match or p["entity_type"] == g["entity_type"]),
            default=0.0)
        partial_recall_sum += best

    return {
        "num_gold": len(gold),
        "num_pred": len(pred),
        "exact_matches": exact_matches,
        "boundary_matches": boundary_matches,
        "partial_precision_sum": partial_precision_sum,
        "partial_recall_sum": partial_recall_sum,
        "type_stats": type_stats,
    }


def _prf(matches: float, n_pred: int, n_gold: int) -> tuple:
    p = matches / n_pred if n_pred else 0.0
    r = matches / n_gold if n_gold else 0.0
    return p, r, f1_score(p, r)


def evaluate_discontinuous_ner(gold: list, pred: list,
                               require_type_match: bool = True) -> dict:
    """Full single-corpus port of evaluate_discontinuous_ner
    (:195-407). Returns the DiscontinuousNERMetrics fields plus the
    per-type map {type: {exact_f1, boundary_f1, gold_count,
    pred_count, exact_matches}}."""
    if not gold and not pred:
        return {"exact_f1": 1.0, "exact_precision": 1.0, "exact_recall": 1.0,
                "entity_boundary_f1": 1.0, "entity_boundary_precision": 1.0,
                "entity_boundary_recall": 1.0, "partial_span_f1": 1.0,
                "partial_span_precision": 1.0, "partial_span_recall": 1.0,
                "num_predicted": 0, "num_gold": 0, "exact_matches": 0,
                "boundary_matches": 0, "per_type": {}}
    c = _match_counts(gold, pred, require_type_match)
    ep, er, ef = _prf(c["exact_matches"], c["num_pred"], c["num_gold"])
    bp, br, bf = _prf(c["boundary_matches"], c["num_pred"], c["num_gold"])
    pp = c["partial_precision_sum"] / c["num_pred"] if c["num_pred"] else 0.0
    pr = c["partial_recall_sum"] / c["num_gold"] if c["num_gold"] else 0.0
    per_type = {}
    for t, (gn, pn, ex, bo) in c["type_stats"].items():
        tep, ter, tef = _prf(ex, pn, gn)
        tbp, tbr, tbf = _prf(bo, pn, gn)
        per_type[t] = {"exact_f1": tef, "boundary_f1": tbf, "gold_count": gn,
                       "pred_count": pn, "exact_matches": ex}
    return {"exact_f1": ef, "exact_precision": ep, "exact_recall": er,
            "entity_boundary_f1": bf, "entity_boundary_precision": bp,
            "entity_boundary_recall": br,
            "partial_span_f1": f1_score(pp, pr),
            "partial_span_precision": pp, "partial_span_recall": pr,
            "num_predicted": c["num_pred"], "num_gold": c["num_gold"],
            "exact_matches": c["exact_matches"],
            "boundary_matches": c["boundary_matches"], "per_type": per_type}


# ---------------------------------------------------------------------------
# Spark path: per-document matching, relational rollups

_COUNTS_SCHEMA = (
    "url string, entity_type string, gold_count long, pred_count long, "
    "exact_matches long, boundary_matches long, "
    "partial_precision_sum double, partial_recall_sum double"
)


def match_counts_df(gold: DataFrame, pred: DataFrame,
                    require_type_match: bool = True) -> DataFrame:
    """Per-(url, entity_type) match counts. Input schemas:
    (url, entity_type, spans array<array<long>>) [+ anything else].
    One shuffle on url; the transcribed greedy matcher runs per
    document. Partial sums are attributed to the pred side's type
    (precision sums) and the gold side's type (recall sums), which
    decomposes exactly under type-matched scoring and still totals
    correctly without it.

    Both sides are unioned with a ``side`` tag and grouped ONCE rather
    than cogrouped: this sandbox's arrow path segfaults on cogroup
    groups whose gold or pred side is empty (a pred-only document),
    and the union shape is one shuffle either way."""

    def per_doc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gmask = pdf["side"] == "g"
        gold_list = [{"spans": [tuple(map(int, s)) for s in row],
                      "entity_type": t}
                     for row, t in zip(pdf["spans"][gmask],
                                       pdf["entity_type"][gmask])]
        pred_list = [{"spans": [tuple(map(int, s)) for s in row],
                      "entity_type": t}
                     for row, t in zip(pdf["spans"][~gmask],
                                       pdf["entity_type"][~gmask])]
        c = _match_counts(gold_list, pred_list, require_type_match)
        # per-pred-type precision sums / per-gold-type recall sums
        pp_by_type: dict = {}
        for p in pred_list:
            best = max(
                (multi_span_overlap(p["spans"], g["spans"]) for g in gold_list
                 if not require_type_match
                 or p["entity_type"] == g["entity_type"]),
                default=0.0)
            pp_by_type[p["entity_type"]] = pp_by_type.get(p["entity_type"], 0.0) + best
        pr_by_type: dict = {}
        for g in gold_list:
            best = max(
                (multi_span_overlap(p["spans"], g["spans"]) for p in pred_list
                 if not require_type_match
                 or p["entity_type"] == g["entity_type"]),
                default=0.0)
            pr_by_type[g["entity_type"]] = pr_by_type.get(g["entity_type"], 0.0) + best
        rows = []
        for t, (gn, pn, ex, bo) in c["type_stats"].items():
            rows.append((key[0], t, gn, pn, ex, bo,
                         pp_by_type.get(t, 0.0), pr_by_type.get(t, 0.0)))
        return pd.DataFrame(rows, columns=[
            "url", "entity_type", "gold_count", "pred_count",
            "exact_matches", "boundary_matches",
            "partial_precision_sum", "partial_recall_sum"])

    g = gold.select("url", "entity_type", "spans", F.lit("g").alias("side"))
    p = pred.select("url", "entity_type", "spans", F.lit("p").alias("side"))
    return (g.unionByName(p).groupBy("url")
             .applyInPandas(per_doc, schema=_COUNTS_SCHEMA))


def _metrics_exprs(prefix: str, matches, npred, ngold):
    p = F.when(npred > 0, matches / npred).otherwise(F.lit(0.0))
    r = F.when(ngold > 0, matches / ngold).otherwise(F.lit(0.0))
    f = F.when(p + r > 0.0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))
    return [p.alias(f"{prefix}_precision"), r.alias(f"{prefix}_recall"),
            f.alias(f"{prefix}_f1")]


def discontinuous_metrics(counts: DataFrame) -> DataFrame:
    """Corpus-level DiscontinuousNERMetrics row from the per-(url, type)
    counts — one aggregation; the both-empty corpus degenerates to the
    all-1.0 row (:200-217)."""
    agg = counts.agg(
        F.coalesce(F.sum("gold_count"), F.lit(0)).alias("num_gold"),
        F.coalesce(F.sum("pred_count"), F.lit(0)).alias("num_predicted"),
        F.coalesce(F.sum("exact_matches"), F.lit(0)).alias("exact_matches"),
        F.coalesce(F.sum("boundary_matches"), F.lit(0)).alias("boundary_matches"),
        F.coalesce(F.sum("partial_precision_sum"), F.lit(0.0)).alias("pp_sum"),
        F.coalesce(F.sum("partial_recall_sum"), F.lit(0.0)).alias("pr_sum"),
    )
    ng, np_ = F.col("num_gold"), F.col("num_predicted")
    em, bm = F.col("exact_matches"), F.col("boundary_matches")
    exprs = (_metrics_exprs("exact", em, np_, ng)
             + _metrics_exprs("entity_boundary", bm, np_, ng))
    pp = F.when(np_ > 0, F.col("pp_sum") / np_).otherwise(F.lit(0.0))
    pr = F.when(ng > 0, F.col("pr_sum") / ng).otherwise(F.lit(0.0))
    pf = F.when(pp + pr > 0.0, 2.0 * pp * pr / (pp + pr)).otherwise(F.lit(0.0))
    out = agg.select(
        "num_gold", "num_predicted", "exact_matches", "boundary_matches",
        *exprs,
        pp.alias("partial_span_precision"), pr.alias("partial_span_recall"),
        pf.alias("partial_span_f1"),
    )
    # apply the both-empty all-1.0 rule to every metric column
    metric_cols = [c for c in out.columns if c.endswith(("_precision", "_recall", "_f1"))]
    for c in metric_cols:
        out = out.withColumn(
            c, F.when((F.col("num_gold") == 0) & (F.col("num_predicted") == 0),
                      F.lit(1.0)).otherwise(F.col(c)))
    return out


def per_type_metrics(counts: DataFrame) -> DataFrame:
    """TypeMetrics per entity type (:355-399) — one groupBy."""
    agg = counts.groupBy("entity_type").agg(
        F.sum("gold_count").alias("gold_count"),
        F.sum("pred_count").alias("pred_count"),
        F.sum("exact_matches").alias("exact_matches"),
        F.sum("boundary_matches").alias("boundary_matches"),
    )
    gn, pn = F.col("gold_count"), F.col("pred_count")
    ex, bo = F.col("exact_matches"), F.col("boundary_matches")

    def tf1(m):
        p = F.when(pn > 0, m / pn).otherwise(F.lit(0.0))
        r = F.when(gn > 0, m / gn).otherwise(F.lit(0.0))
        return F.when(p + r > 0.0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))

    return agg.select(
        "entity_type",
        tf1(ex).alias("exact_f1"), tf1(bo).alias("boundary_f1"),
        "gold_count", "pred_count", "exact_matches")


def evaluate_discontinuous_df(gold: DataFrame, pred: DataFrame,
                              require_type_match: bool = True) -> DataFrame:
    """End-to-end: per-document matching then the corpus metrics row."""
    return discontinuous_metrics(
        match_counts_df(gold, pred, require_type_match))

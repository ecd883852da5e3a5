"""SemEval-2013 Task 9.1 NER evaluation modes: Strict/Exact/Partial/Type.

Behavioral port of the reference's multi-mode evaluator (reference:
anno/src/eval/modes.rs:1-893).  One prediction set, four verdicts:

* Strict  — exact boundary AND exact type (the CoNLL headline number)
* Exact   — exact boundary, type free (boundary-detection skill)
* Partial — any/thresholded overlap AND exact type
* Type    — any overlap AND exact type (same predicate as Partial at
  min_overlap=0 — the reference keeps both rows, modes.rs:424-447)

Counting is the reference's greedy first-match walk (modes.rs:490-524):
predictions in order, each claims the first unclaimed gold it matches
— order-dependent by design (a reference semantics, kept).

Distribution: per-document counting is pure Python inside an
``applyInPandas`` group step; the corpus-level P/R/F1 is one sum over
per-document TP/FP/FN — associative, so map-side partial aggregation
applies and no mode ever shuffles mention rows twice.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "EVAL_MODES",
    "EvalConfig",
    "ModeResults",
    "overlap_ratio",
    "count_matches",
    "evaluate_with_mode",
    "multi_mode_results",
    "multi_mode_df",
]

EVAL_MODES = ("strict", "exact", "partial", "type")

_MODE_DESCRIPTIONS = {
    "strict": "Exact boundary + exact type (CoNLL standard)",
    "exact": "Exact boundary only (type can differ)",
    "partial": "Partial boundary overlap + exact type",
    "type": "Any overlap + exact type",
}


@dataclass
class EvalConfig:
    """min_overlap = minimum IoU for partial/type matches; 0.0 accepts
    any overlap (modes.rs:182-221)."""

    min_overlap: float = 0.0

    def __post_init__(self):
        self.min_overlap = min(max(self.min_overlap, 0.0), 1.0)


@dataclass
class ModeResults:
    mode: str
    precision: float
    recall: float
    f1: float
    true_positives: int
    false_positives: int
    false_negatives: int


def _has_overlap(s1, e1, s2, e2) -> bool:
    return s1 < e2 and s2 < e1


def overlap_ratio(s1, e1, s2, e2) -> float:
    """Span IoU (modes.rs:469-487).

    The union==0 -> 1.0 branch is transcribed but unreachable — two
    zero-width spans hit the istart >= iend early return first and
    score 0.0.  The reference has the identical dead branch; parity
    keeps it.
    """
    istart, iend = max(s1, s2), min(e1, e2)
    if istart >= iend:
        return 0.0
    intersection = iend - istart
    union = (e1 - s1) + (e2 - s2) - intersection
    return 1.0 if union == 0 else intersection / union


def _entities_match(pred, gold, mode: str, config: EvalConfig) -> bool:
    """pred/gold are (start, end, entity_type) triples
    (modes.rs:628-651)."""
    ps, pe, pt = pred
    gs, ge, gt = gold
    if mode == "strict":
        return ps == gs and pe == ge and pt == gt
    if mode == "exact":
        return ps == gs and pe == ge
    # partial / type: (thresholded) overlap + exact type.  NOTE: the
    # min_overlap threshold applies to TYPE mode too — the reference's
    # config path treats Partial|Type as one arm (modes.rs:640-651)
    # even though its descriptions say Type is "any overlap"; behavior
    # wins over the description, transcribed as-is.
    if not _has_overlap(ps, pe, gs, ge):
        return False
    if config.min_overlap > 0.0 and \
            overlap_ratio(ps, pe, gs, ge) < config.min_overlap:
        return False
    return pt == gt


def count_matches(predicted: list, gold: list, mode: str,
                  config: EvalConfig | None = None) -> tuple:
    """(tp, fp, fn) via greedy first-unclaimed-gold matching
    (modes.rs:490-524)."""
    config = config or EvalConfig()
    gold_matched = [False] * len(gold)
    tp = fp = 0
    for pred in predicted:
        found = False
        for i, g in enumerate(gold):
            if gold_matched[i]:
                continue
            if _entities_match(pred, g, mode, config):
                gold_matched[i] = True
                found = True
                tp += 1
                break
        if not found:
            fp += 1
    fn = sum(1 for m in gold_matched if not m)
    return tp, fp, fn


def _prf(tp: int, fp: int, fn: int) -> tuple:
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return precision, recall, f1


def evaluate_with_mode(predicted: list, gold: list, mode: str,
                       config: EvalConfig | None = None) -> ModeResults:
    tp, fp, fn = count_matches(predicted, gold, mode, config)
    precision, recall, f1 = _prf(tp, fp, fn)
    return ModeResults(mode, precision, recall, f1, tp, fp, fn)


def multi_mode_results(predicted: list, gold: list,
                       config: EvalConfig | None = None) -> dict:
    """All four modes at once (MultiModeResults::compute,
    modes.rs:361-373)."""
    return {m: evaluate_with_mode(predicted, gold, m, config)
            for m in EVAL_MODES}


# ---------------------------------------------------------------------------
# distributed surface


def add_prf_columns(df, fn_col: str = "fn"):
    """Append precision/recall/f1 column expressions to a DataFrame
    carrying tp/fp/<fn_col> counters (shared by multi_mode_df and
    benchmark.edge_case_scores)."""
    from pyspark.sql import functions as F

    precision = F.when(F.col("tp") + F.col("fp") > 0,
                       F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    recall = F.when(F.col("tp") + F.col(fn_col) > 0,
                    F.col("tp") / (F.col("tp") + F.col(fn_col))).otherwise(0.0)
    out = df.withColumn("precision", precision).withColumn("recall", recall)
    f1 = F.when(F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall"))).otherwise(0.0)
    return out.withColumn("f1", f1)


def multi_mode_df(pred, gold, doc_col: str = "url",
                  config: EvalConfig | None = None):
    """Corpus-level four-mode PRF as a 4-row DataFrame.

    ``pred``/``gold`` carry (doc_col, start, end, entity_type) — mention
    order within a document follows (start, end, entity_type) sort so the
    greedy walk is deterministic regardless of partitioning.  Per-doc
    counting runs in one ``applyInPandas`` over a full-outer doc-id join
    (documents present on one side only still contribute their FPs/FNs);
    the final groupBy sums the associative TP/FP/FN counters.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    cfg = config or EvalConfig()

    def tag(df, side):
        return (
            df.select(
                F.col(doc_col).alias("doc_id"),
                F.col("start").cast("long"),
                F.col("end").cast("long"),
                F.col("entity_type"),
                F.lit(side).alias("side"),
            )
        )

    both = tag(pred, "pred").unionByName(tag(gold, "gold"))

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[pdf["side"] == "pred"].sort_values(
            ["start", "end", "entity_type"])
        g = pdf[pdf["side"] == "gold"].sort_values(
            ["start", "end", "entity_type"])
        preds = list(zip(p["start"], p["end"], p["entity_type"]))
        golds = list(zip(g["start"], g["end"], g["entity_type"]))
        rows = []
        for mode in EVAL_MODES:
            tp, fp, fn = count_matches(preds, golds, mode, cfg)
            rows.append((mode, tp, fp, fn))
        return pd.DataFrame(rows, columns=["mode", "tp", "fp", "fn"])

    per_doc = both.groupBy("doc_id").applyInPandas(
        score, schema="mode string, tp long, fp long, fn long")
    totals = per_doc.groupBy("mode").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"))
    return add_prf_columns(totals).select(
        "mode", "tp", "fp", "fn", "precision", "recall", "f1")

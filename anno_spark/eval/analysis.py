"""NER analysis: type confusion matrix and paired significance testing.

Behavioral port of the reference analysis module (reference:
anno/src/eval/analysis.rs:20-640 — the parts not already covered by
:mod:`anno_spark.eval.error_analysis`, which ports error_analysis.rs).

Reference quirks preserved:

* ``build_confusion_matrix`` adds only overlap-matched (pred, gold)
  pairs plus a ``MISSED`` row for unmatched gold — spurious predictions
  with no overlap are silently absent from the matrix
  (analysis.rs:553-588).
* ``paired_t_test``'s p-value is the reference's coarse approximation:
  three buckets (0.10 / 0.03 / 0.005) against fixed critical values
  that switch at df=30 (analysis.rs:506-517) — not a real t CDF.
* Zero-variance differences map to t=0 / p=0.10 (analysis.rs:482-486:
  ``std_error > 0.0`` guard) — a perfectly consistent nonzero gap is
  thus reported "not significant"; the reference does the same, so the
  quirk is transcribed, not fixed.
* n < 2 returns difference 0, p 1.0, and mean_a/mean_b from the single
  score (analysis.rs:447-462).

Distribution: the confusion matrix is a groupBy count over per-document
match pairs emitted by ``applyInPandas`` — associative, map-side
combinable, one shuffle of (predicted, actual) pairs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = [
    "ConfusionMatrix",
    "build_confusion_matrix",
    "confusion_matrix_df",
    "SignificanceTest",
    "paired_t_test",
    "compare_ner_systems",
]


class ConfusionMatrix:
    """matrix[predicted][actual] = count (analysis.rs:20-141)."""

    def __init__(self):
        self.matrix: dict = {}
        self.predicted_totals: dict = {}
        self.actual_totals: dict = {}

    def add(self, predicted: str, actual: str, count: int = 1) -> None:
        row = self.matrix.setdefault(predicted, {})
        row[actual] = row.get(actual, 0) + count
        self.predicted_totals[predicted] = \
            self.predicted_totals.get(predicted, 0) + count
        self.actual_totals[actual] = self.actual_totals.get(actual, 0) + count

    def get(self, predicted: str, actual: str) -> int:
        return self.matrix.get(predicted, {}).get(actual, 0)

    def types(self) -> list:
        return sorted(set(self.predicted_totals) | set(self.actual_totals))

    def precision(self, entity_type: str) -> float:
        predicted = self.predicted_totals.get(entity_type, 0)
        return (self.get(entity_type, entity_type) / predicted
                if predicted else 0.0)

    def recall(self, entity_type: str) -> float:
        actual = self.actual_totals.get(entity_type, 0)
        return (self.get(entity_type, entity_type) / actual
                if actual else 0.0)

    def most_confused(self, top_n: int) -> list:
        """Off-diagonal cells, count-descending (analysis.rs:101-116)."""
        confusions = [(p, a, c)
                      for p, row in self.matrix.items()
                      for a, c in row.items() if p != a and c > 0]
        confusions.sort(key=lambda t: -t[2])
        return confusions[:top_n]

    def render(self) -> str:
        """Text table with [diagonal] brackets (analysis.rs Display)."""
        types = self.types()
        lines = ["{:12}".format("Pred\\Actual")
                 + "".join(f" {t[:8]:>8}" for t in types)]
        for pred in types:
            cells = []
            for actual in types:
                c = self.get(pred, actual)
                cells.append(f" {'[' + str(c) + ']' if pred == actual else (c if c else '.'):>8}")
            lines.append(f"{pred[:12]:12}" + "".join(cells))
        return "\n".join(lines)


def _match_pairs(preds: list, golds: list):
    """Greedy overlap matching for one document (analysis.rs:556-586):
    each prediction claims the first unclaimed overlapping gold; yields
    (pred_type, gold_type) pairs then ('MISSED', gold_type) for leftovers.
    Spurious predictions yield nothing (reference quirk)."""
    gold_matched = [False] * len(golds)
    for (ps, pe, pt) in preds:
        for i, (gs, ge, gt) in enumerate(golds):
            if gold_matched[i]:
                continue
            if ps < ge and pe > gs:
                gold_matched[i] = True
                yield (pt, gt)
                break
    for i, (gs, ge, gt) in enumerate(golds):
        if not gold_matched[i]:
            yield ("MISSED", gt)


def build_confusion_matrix(predictions: list) -> ConfusionMatrix:
    """``predictions`` = [(preds, golds)] per document, spans as
    (start, end, type) triples."""
    cm = ConfusionMatrix()
    for preds, golds in predictions:
        for pred_type, gold_type in _match_pairs(preds, golds):
            cm.add(pred_type, gold_type)
    return cm


def confusion_matrix_df(pred, gold, doc_col: str = "url") -> ConfusionMatrix:
    """Distributed build: per-doc matching in ``applyInPandas`` (spans
    sorted (start, end, type) for partition-independent determinism),
    then one groupBy count; the collected cells are O(#types²)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def tag(df, side):
        return df.select(
            F.col(doc_col).alias("doc_id"),
            F.col("start").cast("long"), F.col("end").cast("long"),
            F.col("entity_type"), F.lit(side).alias("side"))

    both = tag(pred, "pred").unionByName(tag(gold, "gold"))

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[pdf["side"] == "pred"].sort_values(
            ["start", "end", "entity_type"])
        g = pdf[pdf["side"] == "gold"].sort_values(
            ["start", "end", "entity_type"])
        out = list(_match_pairs(
            list(zip(p["start"], p["end"], p["entity_type"])),
            list(zip(g["start"], g["end"], g["entity_type"]))))
        return pd.DataFrame(out, columns=["predicted", "actual"])

    cells = (
        both.groupBy("doc_id")
        .applyInPandas(pairs, schema="predicted string, actual string")
        .groupBy("predicted", "actual").count()
    )
    cm = ConfusionMatrix()
    for row in cells.collect():
        cm.add(row["predicted"], row["actual"], row["count"])
    return cm


@dataclass
class SignificanceTest:
    system_a: str
    system_b: str
    mean_a: float
    mean_b: float
    difference: float
    std_error: float
    t_statistic: float
    p_value: float
    n: int
    significant_05: bool
    significant_01: bool

    def render(self) -> str:
        sig = ("** (p < 0.01)" if self.significant_01
               else "* (p < 0.05)" if self.significant_05
               else "not significant")
        return (f"Paired t-test (n={self.n}):\n"
                f"  {self.system_a}: {self.mean_a * 100:.1f}%\n"
                f"  {self.system_b}: {self.mean_b * 100:.1f}%\n"
                f"  Difference: {self.difference * 100:+.1f}%\n"
                f"  t={self.t_statistic:.3f}, p={self.p_value:.4f}\n"
                f"  {sig}\n")


def _approximate_p_value(t: float, df: int) -> float:
    """Three-bucket approximation (analysis.rs:506-517) — transcribed,
    not replaced with a real CDF."""
    critical_05 = 1.96 if df >= 30 else 2.1
    critical_01 = 2.576 if df >= 30 else 2.9
    if t < critical_05:
        return 0.10
    if t < critical_01:
        return 0.03
    return 0.005


def paired_t_test(system_a: str, scores_a: list,
                  system_b: str, scores_b: list) -> SignificanceTest:
    """Paired t-test on per-case F1 scores (analysis.rs:434-525)."""
    if len(scores_a) != len(scores_b):
        raise ValueError("Scores must have same length")
    n = len(scores_a)
    if n < 2:
        return SignificanceTest(
            system_a, system_b,
            scores_a[0] if scores_a else 0.0,
            scores_b[0] if scores_b else 0.0,
            0.0, 0.0, 0.0, 1.0, n, False, False)
    diffs = [a - b for a, b in zip(scores_a, scores_b)]
    mean_diff = sum(diffs) / n
    mean_a = sum(scores_a) / n
    mean_b = sum(scores_b) / n
    variance = sum((d - mean_diff) ** 2 for d in diffs) / (n - 1)
    std_error = math.sqrt(variance) / math.sqrt(n)
    t_stat = mean_diff / std_error if std_error > 0.0 else 0.0
    p_value = _approximate_p_value(abs(t_stat), n - 1)
    return SignificanceTest(
        system_a, system_b, mean_a, mean_b, mean_diff, std_error,
        t_stat, p_value, n, p_value < 0.05, p_value < 0.01)


def compare_ner_systems(system_a: str, f1_scores_a: list,
                        system_b: str, f1_scores_b: list) -> SignificanceTest:
    return paired_t_test(system_a, f1_scores_a, system_b, f1_scores_b)

"""Visual NER evaluation: text F1, box IoU, end-to-end F1.

Port of anno/src/eval/visual.rs:1-486 (BoundingBox geometry :44-91,
VisualGold/VisualPrediction :97-130, VisualEvalConfig :136-158,
evaluate_visual_ner :240-425, synthetic examples :457-486).

The matcher keeps the reference's greedy single-pass semantics exactly,
including its quirks: the mean-IoU accumulator counts EVERY overlapping
(pred, gold) pair — even pairs that never become matches — and a
prediction keeps scanning gold until it lands an end-to-end match
(text-only / box-only credits do not break the loop), so one prediction
can credit text on one gold and box on another.

Also provides a distributed variant over a DataFrame of (doc_id, gold,
pred) rows: the per-document matcher is a deterministic pure function,
so it rides ``mapInPandas`` (one Arrow batch per partition) and the
corpus-level metrics reduce with one aggregation — the same shape the
100-TB eval path uses for NER scoring.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BoundingBox:
    """visual.rs:44-91 — normalized [0,1] coordinates."""

    x1: float
    y1: float
    x2: float
    y2: float

    def area(self) -> float:
        return max(self.x2 - self.x1, 0.0) * max(self.y2 - self.y1, 0.0)

    def iou(self, other: "BoundingBox") -> float:
        x1 = max(self.x1, other.x1)
        y1 = max(self.y1, other.y1)
        x2 = min(self.x2, other.x2)
        y2 = min(self.y2, other.y2)
        intersection = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
        union = self.area() + other.area() - intersection
        return intersection / union if union > 0.0 else 0.0

    def overlaps(self, other: "BoundingBox", threshold: float) -> bool:
        return self.iou(other) >= threshold


@dataclass
class VisualGold:
    """visual.rs:97-117."""

    text: str
    entity_type: str
    bbox: BoundingBox


@dataclass
class VisualPrediction:
    """visual.rs:119-130."""

    text: str
    entity_type: str
    bbox: BoundingBox
    confidence: float = 1.0


@dataclass
class VisualEvalConfig:
    """visual.rs:136-158 defaults."""

    iou_threshold: float = 0.5
    case_insensitive: bool = False
    normalize_whitespace: bool = True
    require_type_match: bool = True


@dataclass
class VisualTypeMetrics:
    """visual.rs:211-223."""

    entity_type: str
    text_f1: float
    box_f1: float
    e2e_f1: float
    support: int


@dataclass
class VisualNERMetrics:
    """visual.rs:164-208."""

    text_precision: float = 0.0
    text_recall: float = 0.0
    text_f1: float = 0.0
    mean_iou: float = 0.0
    box_precision: float = 0.0
    box_recall: float = 0.0
    box_f1: float = 0.0
    e2e_precision: float = 0.0
    e2e_recall: float = 0.0
    e2e_f1: float = 0.0
    per_type: dict = field(default_factory=dict)
    num_predicted: int = 0
    num_gold: int = 0
    text_matches: int = 0
    box_matches: int = 0
    e2e_matches: int = 0
    # raw accumulators behind mean_iou (not in the reference struct; the
    # distributed reducer needs them to merge per-doc means exactly)
    iou_sum: float = 0.0
    iou_count: int = 0


def _normalize_text(text: str, config: VisualEvalConfig) -> str:
    """visual.rs:431-440."""
    if config.case_insensitive:
        text = text.lower()
    if config.normalize_whitespace:
        text = " ".join(text.split())
    return text


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if p + r > 0 else 0.0


def evaluate_visual_ner(gold, pred, config: VisualEvalConfig | None = None) -> VisualNERMetrics:
    """visual.rs:240-425 — greedy match with the reference's exact loop."""
    config = config or VisualEvalConfig()
    text_matches = box_matches = e2e_matches = 0
    iou_sum = 0.0
    iou_count = 0

    # (gold_count, pred_count, text_tp, box_tp, e2e_tp) per type
    type_stats: dict[str, list] = {}
    for g in gold:
        type_stats.setdefault(g.entity_type, [0, 0, 0, 0, 0])[0] += 1
    for p in pred:
        type_stats.setdefault(p.entity_type, [0, 0, 0, 0, 0])[1] += 1

    gold_text_matched = [False] * len(gold)
    gold_box_matched = [False] * len(gold)
    gold_e2e_matched = [False] * len(gold)

    for p in pred:
        pred_text = _normalize_text(p.text, config)
        for g_idx, g in enumerate(gold):
            if config.require_type_match and p.entity_type != g.entity_type:
                continue
            gold_text = _normalize_text(g.text, config)
            text_match = pred_text == gold_text
            iou = p.bbox.iou(g.bbox)
            box_match = iou >= config.iou_threshold

            if iou > 0.0:  # reference counts every overlapping pair
                iou_sum += iou
                iou_count += 1

            if text_match and not gold_text_matched[g_idx]:
                gold_text_matched[g_idx] = True
                text_matches += 1
                type_stats[g.entity_type][2] += 1
            if box_match and not gold_box_matched[g_idx]:
                gold_box_matched[g_idx] = True
                box_matches += 1
                type_stats[g.entity_type][3] += 1
            if text_match and box_match and not gold_e2e_matched[g_idx]:
                gold_e2e_matched[g_idx] = True
                e2e_matches += 1
                type_stats[g.entity_type][4] += 1
                break  # complete match; next prediction

    num_gold, num_pred = len(gold), len(pred)
    text_p = text_matches / num_pred if num_pred else 0.0
    text_r = text_matches / num_gold if num_gold else 0.0
    box_p = box_matches / num_pred if num_pred else 0.0
    box_r = box_matches / num_gold if num_gold else 0.0
    e2e_p = e2e_matches / num_pred if num_pred else 0.0
    e2e_r = e2e_matches / num_gold if num_gold else 0.0

    per_type = {}
    for et, (g_count, p_count, text_tp, box_tp, e2e_tp) in type_stats.items():
        if g_count > 0 and p_count > 0:
            tf1 = _f1(text_tp / p_count, text_tp / g_count)
            bf1 = _f1(box_tp / p_count, box_tp / g_count)
            ef1 = _f1(e2e_tp / p_count, e2e_tp / g_count)
        else:
            tf1 = bf1 = ef1 = 0.0
        per_type[et] = VisualTypeMetrics(et, tf1, bf1, ef1, g_count)

    return VisualNERMetrics(
        text_precision=text_p,
        text_recall=text_r,
        text_f1=_f1(text_p, text_r),
        mean_iou=iou_sum / iou_count if iou_count else 0.0,
        box_precision=box_p,
        box_recall=box_r,
        box_f1=_f1(box_p, box_r),
        e2e_precision=e2e_p,
        e2e_recall=e2e_r,
        e2e_f1=_f1(e2e_p, e2e_r),
        per_type=per_type,
        num_predicted=num_pred,
        num_gold=num_gold,
        text_matches=text_matches,
        box_matches=box_matches,
        e2e_matches=e2e_matches,
        iou_sum=iou_sum,
        iou_count=iou_count,
    )


def synthetic_visual_examples():
    """visual.rs:457-486 — transcribed synthetic documents."""
    return [
        (
            "Invoice #12345",
            [VisualGold("Invoice #12345", "DOCUMENT_ID", BoundingBox(0.1, 0.05, 0.4, 0.1))],
        ),
        (
            "Total: $1,234.56\nDate: 2024-01-15",
            [
                VisualGold("$1,234.56", "MONEY", BoundingBox(0.5, 0.8, 0.7, 0.85)),
                VisualGold("2024-01-15", "DATE", BoundingBox(0.5, 0.7, 0.7, 0.75)),
            ],
        ),
        (
            "Acme Corp\n123 Main St, City",
            [
                VisualGold("Acme Corp", "ORG", BoundingBox(0.1, 0.1, 0.35, 0.15)),
                VisualGold("123 Main St, City", "ADDRESS", BoundingBox(0.1, 0.16, 0.5, 0.21)),
            ],
        ),
    ]


# ---------------------------------------------------------------------------
# Distributed surface
# ---------------------------------------------------------------------------

BOX_STRUCT = "text string, entity_type string, x1 double, y1 double, x2 double, y2 double"
PRED_STRUCT = BOX_STRUCT + ", confidence double"

_DOC_METRICS_SCHEMA = (
    "doc_id string, num_gold long, num_pred long, text_matches long, "
    "box_matches long, e2e_matches long, iou_sum double, iou_count long"
)


def visual_metrics_df(docs, config: VisualEvalConfig | None = None):
    """Distributed visual-NER scoring.

    ``docs``: DataFrame (doc_id string, gold array<struct BOX_STRUCT>,
    pred array<struct PRED_STRUCT>).  Per-document counts come out of one
    ``mapInPandas`` pass (matching is doc-local, embarrassingly
    parallel); corpus metrics are ONE driver-side aggregate row —
    identical numbers to running :func:`evaluate_visual_ner` on the
    concatenated corpus because every count is a per-doc sum.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    cfg = config or VisualEvalConfig()

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gold_arr = row["gold"] if row["gold"] is not None else []
                pred_arr = row["pred"] if row["pred"] is not None else []
                gold = [
                    VisualGold(g["text"], g["entity_type"],
                               BoundingBox(g["x1"], g["y1"], g["x2"], g["y2"]))
                    for g in gold_arr
                ]
                pred = [
                    VisualPrediction(p["text"], p["entity_type"],
                                     BoundingBox(p["x1"], p["y1"], p["x2"], p["y2"]),
                                     p["confidence"])
                    for p in pred_arr
                ]
                m = evaluate_visual_ner(gold, pred, cfg)
                out.append((row["doc_id"], m.num_gold, m.num_predicted,
                            m.text_matches, m.box_matches, m.e2e_matches,
                            m.iou_sum, m.iou_count))
            yield pd.DataFrame(out, columns=[
                "doc_id", "num_gold", "num_pred", "text_matches",
                "box_matches", "e2e_matches", "iou_sum", "iou_count"])

    per_doc = docs.mapInPandas(run, schema=_DOC_METRICS_SCHEMA)

    def rate(n, d):
        return F.when(d > 0, n / d).otherwise(F.lit(0.0))

    def f1(p, r):
        return F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))

    agg = per_doc.agg(
        F.sum("num_gold").alias("num_gold"),
        F.sum("num_pred").alias("num_pred"),
        F.sum("text_matches").alias("text_matches"),
        F.sum("box_matches").alias("box_matches"),
        F.sum("e2e_matches").alias("e2e_matches"),
        F.sum("iou_sum").alias("iou_sum"),
        F.sum("iou_count").alias("iou_count"),
    )
    tp = rate(F.col("text_matches"), F.col("num_pred"))
    tr = rate(F.col("text_matches"), F.col("num_gold"))
    bp = rate(F.col("box_matches"), F.col("num_pred"))
    br = rate(F.col("box_matches"), F.col("num_gold"))
    ep = rate(F.col("e2e_matches"), F.col("num_pred"))
    er = rate(F.col("e2e_matches"), F.col("num_gold"))
    return agg.select(
        tp.alias("text_precision"), tr.alias("text_recall"),
        f1(tp, tr).alias("text_f1"),
        rate(F.col("iou_sum"), F.col("iou_count")).alias("mean_iou"),
        bp.alias("box_precision"), br.alias("box_recall"),
        f1(bp, br).alias("box_f1"),
        ep.alias("e2e_precision"), er.alias("e2e_recall"),
        f1(ep, er).alias("e2e_f1"),
        "num_pred", "num_gold", "text_matches", "box_matches", "e2e_matches",
    )

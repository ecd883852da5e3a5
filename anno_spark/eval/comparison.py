"""Gold-vs-predicted span comparison (anno-core/src/grounded.rs:2386-2605).

Greedy two-pass matcher: exact spans first (correct / type-mismatch), then
overlapping spans (boundary error with IoU), leftovers become spurious /
missed.  Precision and recall count only exact-span exact-type matches
(grounded.rs:2577-2604) — stricter than eval/ner_eval.py's partial credit,
and that strictness is the CLI `eval` command's contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Sig:
    """One gold or predicted span (char offsets)."""

    id: int
    start: int
    end: int
    surface: str
    label: str
    confidence: float = 1.0


@dataclass
class EvalComparison:
    text: str
    gold: list
    predicted: list
    matches: list = field(default_factory=list)  # list[dict] typed by "type"

    @classmethod
    def compare(cls, text: str, gold: list, predicted: list) -> "EvalComparison":
        """grounded.rs:2459-2556."""
        matches: list[dict] = []
        gold_matched = [False] * len(gold)
        pred_matched = [False] * len(predicted)

        # pass 1 — exact spans
        for pi, p in enumerate(predicted):
            for gi, g in enumerate(gold):
                if gold_matched[gi]:
                    continue
                if (p.start, p.end) == (g.start, g.end):
                    if p.label == g.label:
                        matches.append(
                            {"type": "correct", "gold_id": g.id, "pred_id": p.id}
                        )
                    else:
                        matches.append(
                            {
                                "type": "type_mismatch",
                                "gold_id": g.id,
                                "pred_id": p.id,
                                "gold_label": g.label,
                                "pred_label": p.label,
                            }
                        )
                    gold_matched[gi] = True
                    pred_matched[pi] = True
                    break

        # pass 2 — overlap = boundary error with IoU
        for pi, p in enumerate(predicted):
            if pred_matched[pi]:
                continue
            for gi, g in enumerate(gold):
                if gold_matched[gi]:
                    continue
                if p.start < g.end and p.end > g.start:
                    inter = min(p.end, g.end) - max(p.start, g.start)
                    union = max(p.end, g.end) - min(p.start, g.start)
                    iou = inter / union if union > 0 else 0.0
                    matches.append(
                        {
                            "type": "boundary_error",
                            "gold_id": g.id,
                            "pred_id": p.id,
                            "iou": iou,
                        }
                    )
                    gold_matched[gi] = True
                    pred_matched[pi] = True
                    break

        for pi, p in enumerate(predicted):
            if not pred_matched[pi]:
                matches.append({"type": "false_positive", "pred_id": p.id})
        for gi, g in enumerate(gold):
            if not gold_matched[gi]:
                matches.append({"type": "false_negative", "gold_id": g.id})

        return cls(text=text, gold=gold, predicted=predicted, matches=matches)

    def correct_count(self) -> int:
        return sum(1 for m in self.matches if m["type"] == "correct")

    def error_count(self) -> int:
        return len(self.matches) - self.correct_count()

    def precision(self) -> float:
        return self.correct_count() / len(self.predicted) if self.predicted else 0.0

    def recall(self) -> float:
        return self.correct_count() / len(self.gold) if self.gold else 0.0

    def f1(self) -> float:
        p, r = self.precision(), self.recall()
        return 2 * p * r / (p + r) if p + r > 0 else 0.0

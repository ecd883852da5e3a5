"""Unified evaluation report: core metrics, per-type breakdown, errors,
data quality, recommendations.

Behavioral port of the reference report builder (reference:
anno/src/eval/report.rs:35-1000).  Composes the already-ported analyses
into one structured report with the reference's recommendation rules
and text rendering.

Reference quirks preserved:

* Core matching is gold-side ``any()`` — each gold counts correct if
  ANY prediction matches exactly; a single prediction may satisfy
  multiple identical golds (report.rs:586-605), unlike the greedy
  evaluator in :mod:`anno_spark.eval.evaluator`.  Both exist in the
  reference; parity requires both.
* Recommendation triggers: F1 < 0.5 -> High/Performance;
  recall < 0.7 * precision -> Medium/Coverage (report.rs:676-700).
* The error summary's boundary/type counts are hard-coded 0 ("would
  need span comparison", report.rs:705-710) and top_patterns is the
  first five missed-gold strings.
* Data-quality checks: case-insensitive duplicate-text redundancy rate
  and same-surface-different-type ambiguity count (report.rs:492-550).
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["TestCase", "EvalReport", "ReportBuilder",
           "default_synthetic_cases"]


@dataclass
class TestCase:
    """text + gold (text, entity_type, start, end) tuples."""

    text: str
    gold_entities: list


def default_synthetic_cases() -> list:
    """Minimal quick-eval set (report.rs:900-947)."""
    return [
        TestCase("Meeting on January 15, 2024 at 3:00 PM",
                 [("January 15, 2024", "DATE", 11, 27),
                  ("3:00 PM", "TIME", 31, 38)]),
        TestCase("Contact: user@example.com or call 555-1234",
                 [("user@example.com", "EMAIL", 9, 25),
                  ("555-1234", "PHONE", 34, 42)]),
        TestCase("Invoice total: $1,234.56 USD",
                 [("$1,234.56", "MONEY", 15, 24)]),
    ]


@dataclass
class EvalReport:
    model_name: str
    core: dict
    per_type: dict
    errors: dict | None
    data_quality: dict | None
    bias: dict | None
    recommendations: list
    warnings: list

    def summary(self) -> str:
        """Text rendering (report.rs:797-875)."""
        out = [f"=== Evaluation Report: {self.model_name} ===", ""]
        c = self.core
        out += ["## Core Metrics",
                f"  Precision: {c['precision'] * 100:.1f}%",
                f"  Recall:    {c['recall'] * 100:.1f}%",
                f"  F1:        {c['f1'] * 100:.1f}%",
                f"  ({c['total_correct']} correct / "
                f"{c['total_predicted']} predicted / "
                f"{c['total_gold']} gold)", ""]
        if self.per_type:
            out.append("## Per-Type Breakdown")
            for tname, m in sorted(self.per_type.items(),
                                   key=lambda kv: -kv[1]["support"]):
                out.append(
                    f"  {tname:12} P={m['precision'] * 100:.0f}% "
                    f"R={m['recall'] * 100:.0f}% F1={m['f1'] * 100:.0f}% "
                    f"(n={m['support']})")
            out.append("")
        if self.errors is not None:
            e = self.errors
            out += ["## Error Analysis",
                    f"  Total errors: {e['total_errors']}",
                    f"  False positives: {e['false_positives']}",
                    f"  False negatives: {e['false_negatives']}"]
            if e["top_patterns"]:
                out.append("  Sample errors:")
                out += [f"    - {p}" for p in e["top_patterns"]]
            out.append("")
        if self.recommendations:
            out.append("## Recommendations")
            tag = {"high": "[HIGH]", "medium": "[MED]", "low": "[LOW]"}
            out += [f"  {tag[r['priority']]} {r['message']}"
                    for r in self.recommendations]
            out.append("")
        if self.warnings:
            out.append("## Warnings")
            out += [f"  - {w}" for w in self.warnings]
        return "\n".join(out)

    def to_dict(self) -> dict:
        return {
            "model_name": self.model_name, "core": self.core,
            "per_type": self.per_type, "errors": self.errors,
            "data_quality": self.data_quality, "bias": self.bias,
            "recommendations": self.recommendations,
            "warnings": self.warnings,
        }


class ReportBuilder:
    """Fluent builder (report.rs:234-344)."""

    def __init__(self, model_name: str):
        self.model_name = model_name
        self.include_errors = True
        self.include_data_quality = False
        self.test_data: list | None = None

    def with_error_analysis(self, include: bool = True) -> "ReportBuilder":
        self.include_errors = include
        return self

    def with_data_quality(self, include: bool = True) -> "ReportBuilder":
        self.include_data_quality = include
        return self

    def with_test_data(self, data: list) -> "ReportBuilder":
        self.test_data = data
        return self

    def build(self, extract_fn) -> EvalReport:
        """Run ``extract_fn(text) -> list[Mention]`` over the cases and
        assemble the report (report.rs:558-790)."""
        warnings: list = []
        recommendations: list = []
        test_cases = self.test_data
        if test_cases is None:
            warnings.append(
                "Using synthetic test data (no custom data provided)")
            test_cases = default_synthetic_cases()

        total_gold = total_predicted = total_correct = 0
        per_type_stats: dict = {}  # type -> [gold, predicted, correct]
        all_errors: list = []

        for case in test_cases:
            try:
                predictions = extract_fn(case.text)
            except Exception as exc:  # reference warns and continues
                warnings.append(
                    f"Failed to extract entities for test case: {exc}")
                predictions = []
            total_gold += len(case.gold_entities)
            total_predicted += len(predictions)
            for (gtext, gtype, gstart, gend) in case.gold_entities:
                entry = per_type_stats.setdefault(gtype, [0, 0, 0])
                entry[0] += 1
                # gold-side any() match — reference quirk, see docstring
                matched = any(
                    p.start == gstart and p.end == gend
                    and p.entity_type == gtype
                    for p in predictions)
                if matched:
                    total_correct += 1
                    entry[2] += 1
                else:
                    all_errors.append(f"Missed: {gtext} ({gtype})")
            for p in predictions:
                per_type_stats.setdefault(p.entity_type, [0, 0, 0])[1] += 1

        precision = total_correct / total_predicted if total_predicted else 0.0
        recall = total_correct / total_gold if total_gold else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall else 0.0)
        core = {"precision": precision, "recall": recall, "f1": f1,
                "total_gold": total_gold,
                "total_predicted": total_predicted,
                "total_correct": total_correct}

        per_type = {}
        for tname, (g, pr, c) in per_type_stats.items():
            p_ = c / pr if pr else 0.0
            r_ = c / g if g else 0.0
            f_ = 2 * p_ * r_ / (p_ + r_) if p_ + r_ else 0.0
            per_type[tname] = {"precision": p_, "recall": r_, "f1": f_,
                               "support": g, "predicted": pr, "correct": c}

        if f1 < 0.5:
            recommendations.append({
                "priority": "high", "category": "performance",
                "message": f"F1 score ({f1 * 100:.1f}%) is below "
                           f"acceptable threshold",
                "estimated_impact": "Core functionality compromised"})
        if recall < precision * 0.7:
            recommendations.append({
                "priority": "medium", "category": "coverage",
                "message": "Recall significantly lower than precision - "
                           "model is too conservative",
                "estimated_impact": "Missing many valid entities"})

        errors = None
        if self.include_errors:
            fn_count = total_gold - total_correct
            fp_count = total_predicted - total_correct
            errors = {"total_errors": fn_count + fp_count,
                      "boundary_errors": 0, "type_errors": 0,
                      "false_positives": fp_count,
                      "false_negatives": fn_count,
                      "top_patterns": all_errors[:5]}

        data_quality = None
        if self.include_data_quality:
            data_quality = _data_quality_checks(test_cases)

        return EvalReport(self.model_name, core, per_type, errors,
                          data_quality, None, recommendations, warnings)


def _data_quality_checks(test_cases: list) -> dict:
    """Redundancy + ambiguity sweep (report.rs:492-550)."""
    if not test_cases:
        return {"leakage_detected": False, "redundancy_rate": 0.0,
                "ambiguous_count": 0}
    seen = set()
    duplicates = 0
    for case in test_cases:
        normalized = case.text.lower()
        if normalized in seen:
            duplicates += 1
        else:
            seen.add(normalized)
    text_to_types: dict = {}
    for case in test_cases:
        for (gtext, gtype, _s, _e) in case.gold_entities:
            text_to_types.setdefault(gtext.lower(), set()).add(gtype)
    ambiguous = sum(1 for types in text_to_types.values() if len(types) > 1)
    return {"leakage_detected": False,
            "redundancy_rate": duplicates / len(test_cases),
            "ambiguous_count": ambiguous}

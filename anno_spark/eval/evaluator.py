"""Standard NER evaluator: per-case metrics, micro/macro aggregation,
confidence intervals, metric goals.

Behavioral port of the reference evaluator (reference:
anno/src/eval/evaluator.rs:1-745).  Matching here is exact span + exact
type with greedy gold-claiming (a duplicate prediction cannot inflate
precision, evaluator.rs:362-380); aggregation follows seqeval
conventions — micro as the primary number, macro/std/CI as secondary.

Distribution contract: per-case metrics are independent, so the harness
computes them inside ``mapInPandas`` and this module's ``aggregate``
reduces the (small) per-case table driver-side — one row per test case,
never per mention.

Reference details preserved:

* Std dev uses the n-1 sample estimator and returns 0.0 below two
  cases (evaluator.rs:706-716).
* The 95% CI uses the z approximation (1.96) and clamps both bounds to
  [0,1] (evaluator.rs:726-745); None below two cases.
* Per-type counting runs its own match loop: each GOLD claims any
  matching prediction once, independent of the overall greedy walk
  (evaluator.rs:383-414) — the two can disagree on pathological
  duplicate-gold inputs, and parity requires both loops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

__all__ = [
    "TypeMetrics",
    "CaseMetrics",
    "AggregateMetrics",
    "MetricGoals",
    "evaluate_test_case",
    "aggregate",
    "check_goals",
    "std_dev",
    "ci_95",
]


@dataclass
class TypeMetrics:
    precision: float = 0.0
    recall: float = 0.0
    f1: float = 0.0
    found: int = 0
    expected: int = 0
    correct: int = 0


@dataclass
class CaseMetrics:
    test_case_id: str | None
    precision: float
    recall: float
    f1: float
    per_type: dict
    found: int
    expected: int
    correct: int
    tokens_per_second: float = 0.0


@dataclass
class AggregateMetrics:
    precision: float
    recall: float
    f1: float
    macro_precision: float
    macro_recall: float
    macro_f1: float
    precision_std: float
    recall_std: float
    f1_std: float
    precision_ci_95: tuple | None
    recall_ci_95: tuple | None
    f1_ci_95: tuple | None
    per_type: dict
    tokens_per_second: float
    num_test_cases: int
    total_found: int
    total_expected: int
    total_correct: int


@dataclass
class MetricGoals:
    """Minimum thresholds; per_type_goals maps type -> MetricGoals
    (evaluator.rs:114-215)."""

    min_precision: float | None = None
    min_recall: float | None = None
    min_f1: float | None = None
    per_type_goals: dict = field(default_factory=dict)


def _prf(correct: int, found: int, expected: int) -> tuple:
    precision = correct / found if found else 0.0
    recall = correct / expected if expected else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return precision, recall, f1


def evaluate_test_case(predicted: list, gold: list,
                       test_case_id: str | None = None,
                       tokens_per_second: float = 0.0) -> CaseMetrics:
    """Exact-match metrics for one case.

    ``predicted``/``gold`` are (start, end, entity_type) triples.  The
    overall walk is prediction-greedy; the per-type walk is gold-greedy
    (both transcribed, see module docstring).
    """
    gold_matched = [False] * len(gold)
    correct = 0
    for (ps, pe, pt) in predicted:
        for i, (gs, ge, gt) in enumerate(gold):
            if gold_matched[i]:
                continue
            if ps == gs and pe == ge and pt == gt:
                gold_matched[i] = True
                correct += 1
                break

    # per-type stats: (found, expected, correct) keyed by type
    stats: dict = {}
    matched_per_type = [False] * len(gold)
    for i, (gs, ge, gt) in enumerate(gold):
        entry = stats.setdefault(gt, [0, 0, 0])
        entry[1] += 1
        if not matched_per_type[i]:
            for (ps, pe, pt) in predicted:
                if ps == gs and pe == ge and pt == gt:
                    matched_per_type[i] = True
                    entry[2] += 1
                    break
    for (_, _, pt) in predicted:
        stats.setdefault(pt, [0, 0, 0])[0] += 1

    precision, recall, f1 = _prf(correct, len(predicted), len(gold))
    per_type = {}
    for tname, (tf, te, tc) in stats.items():
        tp_, tr_, tf1 = _prf(tc, tf, te)
        per_type[tname] = TypeMetrics(tp_, tr_, tf1, tf, te, tc)
    return CaseMetrics(test_case_id, precision, recall, f1, per_type,
                       len(predicted), len(gold), correct,
                       tokens_per_second)


def std_dev(values: list, mean: float) -> float:
    """Sample std dev (n-1); 0.0 below two values (evaluator.rs:706-716)."""
    if len(values) < 2:
        return 0.0
    variance = sum((v - mean) ** 2 for v in values) / (len(values) - 1)
    return math.sqrt(variance)


def ci_95(values: list, mean: float, sd: float):
    """z-approximate 95% CI, clamped to [0,1] (evaluator.rs:726-745)."""
    if len(values) < 2:
        return None
    margin = 1.96 * sd / math.sqrt(len(values))
    return (min(max(mean - margin, 0.0), 1.0),
            min(max(mean + margin, 0.0), 1.0))


def aggregate(cases: list) -> AggregateMetrics:
    """Micro (primary) + macro/std/CI (secondary) + per-type micro
    (evaluator.rs:489-637)."""
    if not cases:
        raise ValueError("Cannot aggregate empty metrics")
    total_found = sum(c.found for c in cases)
    total_expected = sum(c.expected for c in cases)
    total_correct = sum(c.correct for c in cases)
    micro_p, micro_r, micro_f1 = _prf(total_correct, total_found,
                                      total_expected)

    precisions = [c.precision for c in cases]
    recalls = [c.recall for c in cases]
    f1s = [c.f1 for c in cases]
    macro_p = sum(precisions) / len(precisions)
    macro_r = sum(recalls) / len(recalls)
    macro_f1 = sum(f1s) / len(f1s)
    tps = [c.tokens_per_second for c in cases]
    mean_tps = sum(tps) / len(tps)

    p_std = std_dev(precisions, macro_p)
    r_std = std_dev(recalls, macro_r)
    f_std = std_dev(f1s, macro_f1)

    per_type_totals: dict = {}
    for c in cases:
        for tname, tm in c.per_type.items():
            entry = per_type_totals.setdefault(tname, [0, 0, 0])
            entry[0] += tm.found
            entry[1] += tm.expected
            entry[2] += tm.correct
    per_type = {}
    for tname, (tf, te, tc) in per_type_totals.items():
        tp_, tr_, tf1 = _prf(tc, tf, te)
        per_type[tname] = TypeMetrics(tp_, tr_, tf1, tf, te, tc)

    return AggregateMetrics(
        precision=micro_p, recall=micro_r, f1=micro_f1,
        macro_precision=macro_p, macro_recall=macro_r, macro_f1=macro_f1,
        precision_std=p_std, recall_std=r_std, f1_std=f_std,
        precision_ci_95=ci_95(precisions, macro_p, p_std),
        recall_ci_95=ci_95(recalls, macro_r, r_std),
        f1_ci_95=ci_95(f1s, macro_f1, f_std),
        per_type=per_type,
        tokens_per_second=mean_tps,
        num_test_cases=len(cases),
        total_found=total_found,
        total_expected=total_expected,
        total_correct=total_correct,
    )


def check_goals(metrics: AggregateMetrics, goals: MetricGoals) -> list:
    """Failures as (metric_name, actual, goal) triples; empty = all goals
    met (evaluator.rs:640-704)."""
    failures = []

    def check(name, actual, goal):
        if goal is not None and actual < goal:
            failures.append((name, actual, goal))

    check("precision", metrics.precision, goals.min_precision)
    check("recall", metrics.recall, goals.min_recall)
    check("f1", metrics.f1, goals.min_f1)
    for tname, tgoals in goals.per_type_goals.items():
        tm = metrics.per_type.get(tname)
        if tm is None:
            continue
        check(f"{tname}.precision", tm.precision, tgoals.min_precision)
        check(f"{tname}.recall", tm.recall, tgoals.min_recall)
        check(f"{tname}.f1", tm.f1, tgoals.min_f1)
    return failures

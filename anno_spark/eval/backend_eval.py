"""Backend comparison harness over the synthetic gold corpus.

Port of anno/src/eval/backend_eval.rs:1-778: EvalConfig (:29-58),
EvalMetrics::from_counts (:66-117), BackendResults / EvalReport /
DatasetStats (:119-160), BackendEvaluator (:385-585) with the reference's
lenient match rule (:650-668 — exact span, or same lowercased text within
±2 chars on both offsets), greedy first-match TP counting (:620-648), and
the markdown report (:162-256).

Spark-first: when built with a SparkSession the per-example scoring runs
as ONE ``mapInPandas`` pass per backend over the corpus DataFrame (the
production extraction contract), emitting per-example and per-entity-type
count rows that reduce with groupBys; numbers are identical to the
in-process loop (parity-tested).  The in-process path remains as the
oracle and for CLI use without a JVM.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..core import heuristic_ner, regex_ner, stacked
from . import synthetic


@dataclass
class EvalConfig:
    """backend_eval.rs:29-58 defaults (gliner auto-on only with onnx)."""

    include_pattern: bool = True
    include_heuristic: bool = True
    include_stacked: bool = True
    include_gliner: bool = False
    per_domain: bool = True
    per_difficulty: bool = True
    max_examples: int = 0  # 0 = no limit


@dataclass
class EvalMetrics:
    """backend_eval.rs:66-117."""

    precision: float
    recall: float
    f1: float
    true_positives: int
    false_positives: int
    false_negatives: int
    duration_ms: int
    examples_evaluated: int

    @classmethod
    def from_counts(cls, tp: int, fp: int, fn_: int, duration_ms: float = 0.0,
                    n: int = 0) -> "EvalMetrics":
        precision = tp / (tp + fp) if tp + fp > 0 else 0.0
        recall = tp / (tp + fn_) if tp + fn_ > 0 else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
        return cls(precision, recall, f1, tp, fp, fn_, int(duration_ms), n)


@dataclass
class BackendResults:
    """backend_eval.rs:119-131."""

    name: str
    overall: EvalMetrics
    by_domain: dict = field(default_factory=dict)
    by_difficulty: dict = field(default_factory=dict)
    by_entity_type: dict = field(default_factory=dict)


@dataclass
class DatasetStats:
    """backend_eval.rs:147-160."""

    total_examples: int
    total_entities: int
    by_domain: dict = field(default_factory=dict)
    by_difficulty: dict = field(default_factory=dict)
    by_entity_type: dict = field(default_factory=dict)


@dataclass
class EvalReport:
    """backend_eval.rs:134-256."""

    timestamp: str
    total_examples: int
    backends: list
    dataset_stats: DatasetStats

    def to_markdown(self) -> str:
        """backend_eval.rs:162-256 shape — summary table + breakdowns."""
        md = [
            "# Backend Evaluation Report",
            "",
            f"Generated: {self.timestamp}",
            f"Examples: {self.total_examples} | "
            f"Entities: {self.dataset_stats.total_entities}",
            "",
            "## Overall Results",
            "",
            "| Backend | Precision | Recall | F1 | TP | FP | FN | Time (ms) |",
            "|---------|-----------|--------|----|----|----|----|-----------|",
        ]
        for b in self.backends:
            o = b.overall
            md.append(
                f"| {b.name} | {o.precision:.3f} | {o.recall:.3f} | {o.f1:.3f} "
                f"| {o.true_positives} | {o.false_positives} | "
                f"{o.false_negatives} | {o.duration_ms} |"
            )
        for b in self.backends:
            if b.by_domain:
                md += ["", f"## {b.name} by Domain", "",
                       "| Domain | Precision | Recall | F1 |",
                       "|--------|-----------|--------|----|"]
                for k in sorted(b.by_domain):
                    m = b.by_domain[k]
                    md.append(f"| {k} | {m.precision:.3f} | {m.recall:.3f} | {m.f1:.3f} |")
            if b.by_difficulty:
                md += ["", f"## {b.name} by Difficulty", "",
                       "| Difficulty | Precision | Recall | F1 |",
                       "|-----------|-----------|--------|----|"]
                for k in sorted(b.by_difficulty):
                    m = b.by_difficulty[k]
                    md.append(f"| {k} | {m.precision:.3f} | {m.recall:.3f} | {m.f1:.3f} |")
        return "\n".join(md)


# ---------------------------------------------------------------------------
# Matching (backend_eval.rs:620-668)
# ---------------------------------------------------------------------------


def entities_match(pred, gold_text: str, gold_start: int, gold_end: int) -> bool:
    """backend_eval.rs:650-668 — exact span, or lowercased-text match
    within ±2 chars on both boundaries."""
    if pred.start == gold_start and pred.end == gold_end:
        return True
    if pred.text.lower() == gold_text.lower():
        return abs(pred.start - gold_start) <= 2 and abs(pred.end - gold_end) <= 2
    return False


def compute_entity_matches(predicted, gold) -> tuple[int, int, int]:
    """backend_eval.rs:623-648 — greedy first-unmatched-gold TP count.

    ``gold``: list of (text, entity_type, start) corpus tuples.
    """
    tp = 0
    matched = [False] * len(gold)
    for pred in predicted:
        for i, (g_text, _g_type, g_start) in enumerate(gold):
            if not matched[i] and entities_match(pred, g_text, g_start,
                                                 g_start + len(g_text)):
                matched[i] = True
                tp += 1
                break
    return tp, len(predicted) - tp, len(gold) - tp


def per_type_counts(predicted, gold) -> dict:
    """backend_eval.rs:528-550 — independent per-type TP/FP/FN (any-match
    semantics, not greedy — the reference's exact quirk)."""
    counts: dict[str, list] = {}
    for g_text, g_type, g_start in gold:
        entry = counts.setdefault(g_type, [0, 0, 0])
        if any(entities_match(p, g_text, g_start, g_start + len(g_text))
               for p in predicted):
            entry[0] += 1
        else:
            entry[2] += 1
    for p in predicted:
        if not any(entities_match(p, g_text, g_start, g_start + len(g_text))
                   for g_text, _g, g_start in gold):
            counts.setdefault(p.entity_type, [0, 0, 0])[1] += 1
    return counts


_BACKENDS = {
    "Pattern": regex_ner.extract_entities,
    "Heuristic": heuristic_ner.extract_entities,
    "Stacked": stacked.extract_entities,
}


def compute_dataset_stats(examples) -> DatasetStats:
    """backend_eval.rs:590-618."""
    by_domain: dict[str, int] = {}
    by_difficulty: dict[str, int] = {}
    by_entity_type: dict[str, int] = {}
    total_entities = 0
    for text, entities, domain, difficulty in examples:
        by_domain[domain] = by_domain.get(domain, 0) + 1
        by_difficulty[difficulty] = by_difficulty.get(difficulty, 0) + 1
        for _t, etype, _s in entities:
            by_entity_type[etype] = by_entity_type.get(etype, 0) + 1
            total_entities += 1
    return DatasetStats(len(examples), total_entities, by_domain,
                        by_difficulty, by_entity_type)


class BackendEvaluator:
    """backend_eval.rs:385-585 — compare rule-tier backends on gold.

    With ``spark`` the scoring distributes (one Arrow pass per backend);
    without, it runs in-process (the oracle path).
    """

    def __init__(self, config: EvalConfig | None = None, spark=None):
        self.config = config or EvalConfig()
        self.spark = spark

    @classmethod
    def with_config(cls, config: EvalConfig, spark=None) -> "BackendEvaluator":
        return cls(config, spark)

    # dataset entry points (backend_eval.rs:403-431)
    def run_comprehensive(self) -> EvalReport:
        return self.evaluate_on(synthetic.all_datasets())

    def run_domain(self, domain: str) -> EvalReport:
        return self.evaluate_on(synthetic.datasets_by_domain(domain))

    def run_difficulty(self, difficulty: str) -> EvalReport:
        return self.evaluate_on(synthetic.datasets_by_difficulty(difficulty))

    def run_technology(self) -> EvalReport:
        return self.evaluate_on(synthetic.dataset("technology"))

    def run_healthcare(self) -> EvalReport:
        return self.evaluate_on(synthetic.dataset("healthcare"))

    def evaluate_on(self, examples) -> EvalReport:
        if self.config.max_examples > 0:
            examples = examples[: self.config.max_examples]
        backends = []
        enabled = [
            name for name, flag in (
                ("Pattern", self.config.include_pattern),
                ("Heuristic", self.config.include_heuristic),
                ("Stacked", self.config.include_stacked),
            ) if flag
        ]
        # include_gliner needs onnxruntime; skipped with the same silence
        # as the reference's log::warn path when the model can't load
        for name in enabled:
            if self.spark is not None:
                backends.append(self._evaluate_backend_spark(name, examples))
            else:
                backends.append(self._evaluate_backend(name, examples))
        return EvalReport(
            timestamp=time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
            total_examples=len(examples),
            backends=backends,
            dataset_stats=compute_dataset_stats(examples),
        )

    # ------------------------------------------------------------------
    # in-process scoring (the oracle)
    # ------------------------------------------------------------------

    def _evaluate_backend(self, name: str, examples) -> BackendResults:
        extract = _BACKENDS[name]
        start = time.perf_counter()
        overall = [0, 0, 0]
        domain_counts: dict[str, list] = {}
        difficulty_counts: dict[str, list] = {}
        type_counts: dict[str, list] = {}

        for text, entities, domain, difficulty in examples:
            predicted = extract(text)
            tp, fp, fn_ = compute_entity_matches(predicted, entities)
            overall[0] += tp
            overall[1] += fp
            overall[2] += fn_
            if self.config.per_domain:
                d = domain_counts.setdefault(domain, [0, 0, 0])
                d[0] += tp; d[1] += fp; d[2] += fn_
            if self.config.per_difficulty:
                d = difficulty_counts.setdefault(difficulty, [0, 0, 0])
                d[0] += tp; d[1] += fp; d[2] += fn_
            for etype, (ttp, tfp, tfn) in per_type_counts(predicted, entities).items():
                d = type_counts.setdefault(etype, [0, 0, 0])
                d[0] += ttp; d[1] += tfp; d[2] += tfn

        duration_ms = (time.perf_counter() - start) * 1000.0
        return BackendResults(
            name=name,
            overall=EvalMetrics.from_counts(*overall, duration_ms, len(examples)),
            by_domain={k: EvalMetrics.from_counts(*v) for k, v in domain_counts.items()},
            by_difficulty={k: EvalMetrics.from_counts(*v)
                           for k, v in difficulty_counts.items()},
            by_entity_type={k: EvalMetrics.from_counts(*v)
                            for k, v in type_counts.items()},
        )

    # ------------------------------------------------------------------
    # distributed scoring
    # ------------------------------------------------------------------

    def _evaluate_backend_spark(self, name: str, examples) -> BackendResults:
        """One mapInPandas pass emitting (scope, key, tp, fp, fn) count
        rows per example; breakdowns reduce with a single groupBy."""
        import pandas as pd
        from pyspark.sql import functions as F

        extract = _BACKENDS[name]
        rows = [(i, text, domain, difficulty,
                 [(t, ty, s) for (t, ty, s) in entities])
                for i, (text, entities, domain, difficulty) in enumerate(examples)]
        df = self.spark.createDataFrame(
            rows,
            "example_id long, text string, domain string, difficulty string, "
            "gold array<struct<text string, entity_type string, start long>>",
        )

        def run(batches):
            for pdf in batches:
                out = []
                for _, row in pdf.iterrows():
                    gold = [(g["text"], g["entity_type"], g["start"])
                            for g in row["gold"]]
                    predicted = extract(row["text"])
                    tp, fp, fn_ = compute_entity_matches(predicted, gold)
                    out.append(("example", row["domain"], tp, fp, fn_))
                    out.append(("difficulty", row["difficulty"], tp, fp, fn_))
                    for etype, (ttp, tfp, tfn) in per_type_counts(
                            predicted, gold).items():
                        out.append(("type", etype, ttp, tfp, tfn))
                yield pd.DataFrame(
                    out, columns=["scope", "key", "tp", "fp", "fn"])

        start = time.perf_counter()
        counts = (
            df.mapInPandas(
                run, schema="scope string, key string, tp long, fp long, fn long")
            .groupBy("scope", "key")
            .agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
                 F.sum("fn").alias("fn"))
            .collect()
        )
        duration_ms = (time.perf_counter() - start) * 1000.0

        overall = [0, 0, 0]
        by_domain: dict[str, EvalMetrics] = {}
        by_difficulty: dict[str, EvalMetrics] = {}
        by_type: dict[str, EvalMetrics] = {}
        for r in counts:
            m = EvalMetrics.from_counts(r["tp"], r["fp"], r["fn"])
            if r["scope"] == "example":
                overall[0] += r["tp"]; overall[1] += r["fp"]; overall[2] += r["fn"]
                if self.config.per_domain:
                    by_domain[r["key"]] = m
            elif r["scope"] == "difficulty":
                if self.config.per_difficulty:
                    by_difficulty[r["key"]] = m
            else:
                by_type[r["key"]] = m
        return BackendResults(
            name=name,
            overall=EvalMetrics.from_counts(*overall, duration_ms, len(examples)),
            by_domain=by_domain,
            by_difficulty=by_difficulty,
            by_entity_type=by_type,
        )

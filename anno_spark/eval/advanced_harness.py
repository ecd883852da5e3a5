"""Advanced evaluation harness: discontinuous NER, relations, visual NER.

Port of anno/src/eval/advanced_harness.rs:1-328.  Thin composition over
the already-ported evaluators — no metric logic lives here:

* discontinuous → :mod:`anno_spark.eval.discontinuous` over the
  transcribed corpus (:mod:`anno_spark.eval.discontinuous_data`)
* relations → :func:`anno_spark.eval.relation_corpus.strict_prf` over the
  transcribed relation corpus (:mod:`anno_spark.eval.relation_data`)
* visual → :mod:`anno_spark.eval.visual`
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from . import discontinuous as disc_mod
from . import discontinuous_data
from . import relation_data
from .relation_corpus import strict_prf
from .visual import (
    VisualEvalConfig,
    VisualPrediction,
    evaluate_visual_ner,
    synthetic_visual_examples,
)


@dataclass
class ModelResult:
    """advanced_harness.rs:85-93."""

    name: str
    primary_f1: float
    metrics: dict = field(default_factory=dict)


@dataclass
class AdvancedTaskResults:
    """advanced_harness.rs:50-82."""

    timestamp: str
    task: str
    models: list
    num_examples: int
    num_gold: int

    def summary(self) -> str:
        s = f"=== {self.task} Evaluation ({self.num_examples} examples) ===\n"
        for m in self.models:
            s += f"\n{m.name}: F1={m.primary_f1 * 100:.1f}%\n"
        return s


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


# =============================================================================
# Discontinuous NER (advanced_harness.rs:101-148)
# =============================================================================


def evaluate_discontinuous_synthetic(extract_fn, require_type_match: bool = True) -> dict:
    """advanced_harness.rs:101-123 — pool gold + predictions over the
    corpus, score once.  ``extract_fn(text) -> list[gold-shaped dicts]``."""
    all_gold: list = []
    all_pred: list = []
    for text, entities, _diff, _dom in discontinuous_data.dataset():
        all_gold.extend(entities)
        all_pred.extend(extract_fn(text))
    return disc_mod.evaluate_discontinuous_ner(all_gold, all_pred, require_type_match)


def evaluate_discontinuous_gold_vs_gold() -> dict:
    """advanced_harness.rs:125-148 — perfect prediction ⇒ every F1 1.0."""
    gold = [
        e for _t, ents, _d, _dom in discontinuous_data.dataset() for e in ents
    ]
    pred = [dict(g, **{"confidence": 1.0}) for g in gold]
    return disc_mod.evaluate_discontinuous_ner(gold, pred)


# =============================================================================
# Relation extraction (advanced_harness.rs:150-218)
# =============================================================================


def _as_key_triples(rels):
    """Corpus 7-tuples ((hs,he), ht, htext, (ts,te), tt, ttext, rtype)
    → the (head_span, tail_span, relation_type) shape strict_prf keys on."""
    return [(hs, ts, rtype) for (hs, _ht, _htx, ts, _tt, _ttx, rtype) in rels]


def _flatten_gold_relations():
    return _as_key_triples(
        [rel for _text, rels, _diff, _dom in relation_data.EXAMPLES for rel in rels]
    )


def evaluate_relations_synthetic(extract_fn) -> dict:
    """advanced_harness.rs:150-188 — ``extract_fn(text)`` returns
    (head_span, tail_span, relation_type) triples; scored with the
    strict 1-1 matcher."""
    all_gold: list = []
    all_pred: list = []
    for text, rels, _diff, _dom in relation_data.EXAMPLES:
        all_gold.extend(_as_key_triples(rels))
        all_pred.extend(extract_fn(text))
    p, r, f1 = strict_prf(all_pred, all_gold)
    return {
        "strict_precision": p,
        "strict_recall": r,
        "strict_f1": f1,
        "num_gold": len(all_gold),
        "num_pred": len(all_pred),
    }


def evaluate_relations_gold_vs_gold() -> dict:
    """advanced_harness.rs:190-218."""
    gold = _flatten_gold_relations()
    p, r, f1 = strict_prf(list(gold), gold)
    return {
        "strict_precision": p,
        "strict_recall": r,
        "strict_f1": f1,
        "num_gold": len(gold),
        "num_pred": len(gold),
    }


# =============================================================================
# Visual NER (advanced_harness.rs:220-246)
# =============================================================================


def evaluate_visual_gold_vs_gold():
    """advanced_harness.rs:220-246 — perfect prediction ⇒ e2e F1 1.0."""
    gold = [e for _text, ents in synthetic_visual_examples() for e in ents]
    pred = [VisualPrediction(g.text, g.entity_type, g.bbox, 1.0) for g in gold]
    return evaluate_visual_ner(gold, pred, VisualEvalConfig())


# =============================================================================
# Dataset statistics (advanced_harness.rs:248-290)
# =============================================================================


@dataclass
class SyntheticDatasetStats:
    """advanced_harness.rs:265-280."""

    discontinuous_examples: int
    discontinuous_entities: int
    relation_examples: int
    relations: int
    visual_examples: int
    visual_entities: int


def synthetic_dataset_stats() -> SyntheticDatasetStats:
    """advanced_harness.rs:248-263."""
    disc = discontinuous_data.dataset()
    rel = relation_data.EXAMPLES
    vis = synthetic_visual_examples()
    return SyntheticDatasetStats(
        discontinuous_examples=len(disc),
        discontinuous_entities=sum(len(ents) for _t, ents, _d, _dom in disc),
        relation_examples=len(rel),
        relations=sum(len(rels) for _t, rels, _d, _dom in rel),
        visual_examples=len(vis),
        visual_entities=sum(len(ents) for _t, ents in vis),
    )


def run_all_gold_vs_gold() -> list:
    """Convenience report: the three gold-vs-gold sanity harnesses as
    AdvancedTaskResults rows (the reference exposes these through its
    test suite; kept callable here for the CLI / notebooks)."""
    disc = evaluate_discontinuous_gold_vs_gold()
    rel = evaluate_relations_gold_vs_gold()
    vis = evaluate_visual_gold_vs_gold()
    stats = synthetic_dataset_stats()
    return [
        AdvancedTaskResults(
            _now(), "Discontinuous NER",
            [ModelResult("gold", disc["exact_f1"], disc)],
            stats.discontinuous_examples, stats.discontinuous_entities),
        AdvancedTaskResults(
            _now(), "Relation Extraction",
            [ModelResult("gold", rel["strict_f1"], rel)],
            stats.relation_examples, stats.relations),
        AdvancedTaskResults(
            _now(), "Visual NER",
            [ModelResult("gold", vis.e2e_f1, {"text_f1": vis.text_f1,
                                              "box_f1": vis.box_f1})],
            stats.visual_examples, stats.visual_entities),
    ]

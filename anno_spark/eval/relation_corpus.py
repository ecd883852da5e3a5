"""Synthetic relation-extraction gold corpus + strict scoring.

Behavioral port of the reference's relation gold set (reference:
anno/src/eval/dataset/synthetic/relations.rs:80-556, transcribed to
``relation_data.py`` by scripts/extract_relation_examples.py): 16
examples / 31 gold relations over 12 relation types across
easy/medium/hard and four domains.

Scoring applies E2's STRICT semantics (anno/src/eval/relation.rs:
158-343, same rule as :mod:`anno_spark.eval.relation_eval`): head span
AND tail span exactly equal, relation type case-insensitive, 1-1
greedy matching — computed here as per-key min-count over
(head_span, tail_span, lower(rel)) multisets.

Five reference offsets are hand-authored one-or-two characters off
(the Larry Page / Sergey Brin / Mountain View / Einstein spans);
transcribed verbatim and pinned by test, not corrected — span-strict
scoring uses the spans as given, exactly like the reference evaluator
would.
"""

from __future__ import annotations

from anno_spark.eval.relation_data import EXAMPLES

__all__ = [
    "dataset",
    "by_difficulty",
    "by_domain",
    "strict_prf",
    "evaluate_extractor",
    "examples_df",
]


def dataset() -> list:
    return list(EXAMPLES)


def by_difficulty(difficulty: str) -> list:
    return [e for e in EXAMPLES if e[2] == difficulty]


def by_domain(domain: str) -> list:
    return [e for e in EXAMPLES if e[3] == domain]


def _key(head_span, tail_span, rel):
    return (tuple(head_span), tuple(tail_span), rel.lower())


def strict_prf(predicted: list, gold: list) -> tuple:
    """(precision, recall, f1) under strict span+type matching.

    ``predicted``/``gold`` are (head_span, tail_span, relation_type)
    triples.  1-1 greedy over exact keys == per-key min count
    (relation.rs:256-294 == relation_eval.py's relational form).
    """
    from collections import Counter

    p = Counter(_key(h, t, r) for (h, t, r) in predicted)
    g = Counter(_key(h, t, r) for (h, t, r) in gold)
    matched = sum(min(p[k], g[k]) for k in p.keys() & g.keys())
    n_pred = sum(p.values())
    n_gold = sum(g.values())
    precision = matched / n_pred if n_pred else 0.0
    recall = matched / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return precision, recall, f1


def evaluate_extractor(extract_fn=None, examples: list | None = None) -> dict:
    """Run a relation extractor over the corpus; default is the engine's
    trigger-pattern pass (core/relations.py via extract_document).

    Returns strict P/R/F1 overall and per difficulty, plus counts.
    ``extract_fn(text) -> list[Triple]``.
    """
    if extract_fn is None:
        from anno_spark.core.document import extract_document

        def extract_fn(text):
            return extract_document(text).triples

    examples = examples if examples is not None else dataset()
    all_pred, all_gold = [], []
    per_difficulty: dict = {}
    for (text, rels, difficulty, _domain) in examples:
        pred = [((t.subj_start, t.subj_end), (t.obj_start, t.obj_end),
                 t.pred) for t in extract_fn(text)]
        gold = [(hs, ts, rel) for (hs, _ht, _htx, ts, _tt, _ttx, rel) in rels]
        all_pred.extend(pred)
        all_gold.extend(gold)
        d = per_difficulty.setdefault(difficulty, ([], []))
        d[0].extend(pred)
        d[1].extend(gold)
    precision, recall, f1 = strict_prf(all_pred, all_gold)
    return {
        "precision": precision, "recall": recall, "f1": f1,
        "n_pred": len(all_pred), "n_gold": len(all_gold),
        "by_difficulty": {
            k: dict(zip(("precision", "recall", "f1"), strict_prf(p, g)))
            for k, (p, g) in per_difficulty.items()
        },
    }


def examples_df(spark, examples: list | None = None):
    """Corpus as (example_id, text) plus exploded gold with the
    relation_eval column contract (url/subj/obj spans + pred)."""
    from pyspark.sql import functions as F

    examples = examples if examples is not None else dataset()
    rows = [(i, text,
             [(hs[0], hs[1], ts[0], ts[1], rel)
              for (hs, _ht, _htx, ts, _tt, _ttx, rel) in rels])
            for i, (text, rels, _d, _dom) in enumerate(examples)]
    df = spark.createDataFrame(
        rows, "example_id long, text string, gold array<struct<"
              "subj_start long, subj_end long, obj_start long, "
              "obj_end long, pred string>>")
    corpus = df.select("example_id", "text")
    gold = df.select(
        F.col("example_id").cast("string").alias("url"),
        F.explode("gold").alias("g")
    ).select("url", "g.subj_start", "g.subj_end", "g.obj_start",
             "g.obj_end", "g.pred")
    return corpus, gold

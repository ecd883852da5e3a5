"""Few-shot NER evaluation (reference: anno/src/eval/few_shot.rs:1-504).

Per-(entity_type, K) precision/recall/F1 over query sets with the
reference's lenient matching — a gold entity counts as correct when
any prediction on the same text matches its exact span OR its
lowercased surface (FewShotEvaluator::evaluate, few_shot.rs:170-236)
— plus macro/micro aggregation, performance-by-K, failed-type
detection and insights (aggregate, few_shot.rs:239-333), and the
support/query task simulator (simulate_few_shot_task,
few_shot.rs:344-393).

Distributed shape: matching is a LEFT SEMI join from gold to
predictions on (task, text) with the span-or-surface predicate; task
results are a full-outer rollup of per-task gold/pred aggregates (a
task that predicted nothing still reports P=0). The aggregate step
collects only the per-task rows — config-bounded at |types| × |K|.

Quirks preserved:

* one PREDICTION may satisfy several golds (the reference breaks per
  gold, not per prediction — an existence test, few_shot.rs:191-204);
* P = 0.0 with no predictions, R = 0.0 with no gold (seqeval
  convention, few_shot.rs:207-220);
* ``failed_types`` uses success_threshold (default 0.5), NOT the 0.1
  the struct comment claims (few_shot.rs:134-135 vs :296-300);
* ``per_type`` keeps ONE result per entity type — last writer wins
  (HashMap insert, few_shot.rs:244-247). The reference's winner is
  input-Vec order; the port canonicalizes feed order to
  (k, entity_type) ascending, so the highest K wins — documented
  determinism fix;
* macro_f1 averages over ALL task rows (every (type, K) pair), not
  the deduplicated per_type map (few_shot.rs:250-255);
* the simulator's "matching" filter keeps any example with a
  non-empty entity list — it does NOT check the entity type
  (few_shot.rs:351-355); support takes each example's FIRST entity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRED_SCHEMA = (
    "entity_type string, k int, text_id long, text string, start long,"
    " end long, confidence double"
)
GOLD_SCHEMA = (
    "entity_type string, k int, text_id long, text string, start long,"
    " end long"
)
_TASK = ["entity_type", "k"]


def few_shot_task_results(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-(entity_type, k) FewShotTaskResults rows
    (few_shot.rs:170-236): precision, recall, f1, num_gold,
    num_predicted, num_correct."""
    p = pred.select(
        *_TASK,
        F.col("text_id").alias("p_tid"),
        F.col("start").alias("p_start"),
        F.col("end").alias("p_end"),
        F.lower("text").alias("p_text"),
    )
    matched = gold.join(
        p,
        (gold["entity_type"] == p["entity_type"])
        & (gold["k"] == p["k"])
        & (gold["text_id"] == p["p_tid"])
        & (
            ((gold["start"] == p["p_start"]) & (gold["end"] == p["p_end"]))
            | (F.lower(gold["text"]) == p["p_text"])
        ),
        "left_semi",
    )
    g_agg = gold.groupBy(*_TASK).agg(F.count("*").alias("num_gold"))
    c_agg = matched.groupBy(*_TASK).agg(F.count("*").alias("num_correct"))
    p_agg = pred.groupBy(*_TASK).agg(F.count("*").alias("num_predicted"))

    j = (
        g_agg.join(p_agg, _TASK, "full_outer")
        .join(c_agg, _TASK, "left")
        .select(
            *_TASK,
            F.coalesce("num_gold", F.lit(0)).alias("num_gold"),
            F.coalesce("num_predicted", F.lit(0)).alias("num_predicted"),
            F.coalesce("num_correct", F.lit(0)).alias("num_correct"),
        )
    )
    prec = F.when(
        F.col("num_predicted") == 0, F.lit(0.0)
    ).otherwise(F.col("num_correct") / F.col("num_predicted"))
    rec = F.when(F.col("num_gold") == 0, F.lit(0.0)).otherwise(
        F.col("num_correct") / F.col("num_gold")
    )
    return j.select(
        *_TASK,
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec == 0.0, F.lit(0.0))
        .otherwise(2.0 * prec * rec / (prec + rec))
        .alias("f1"),
        "num_gold", "num_predicted", "num_correct",
    ).orderBy("k", "entity_type")


@dataclass
class FewShotResults:
    """few_shot.rs:120-137 — collected, config-bounded."""

    per_type: dict[str, object]
    macro_f1: float
    micro_f1: float
    k_values: list[int]
    performance_by_k: list[tuple[int, float]]
    failed_types: list[str]
    insights: list[str] = field(default_factory=list)


def aggregate_few_shot(
    task_results: DataFrame,
    k_values: list[int] | None = None,
    success_threshold: float = 0.5,
) -> FewShotResults:
    """FewShotEvaluator::aggregate (few_shot.rs:239-333) over the
    per-task rows (sorted (k, entity_type) — see module quirks)."""
    rows = task_results.orderBy("k", "entity_type").collect()
    k_values = k_values if k_values is not None else [1, 2, 5, 10]

    per_type = {r.entity_type: r for r in rows}  # last (highest k) wins
    macro_f1 = sum(r.f1 for r in rows) / len(rows) if rows else 0.0

    tc = sum(r.num_correct for r in rows)
    tp = sum(r.num_predicted for r in rows)
    tg = sum(r.num_gold for r in rows)
    mp = tc / tp if tp else 0.0
    mr = tc / tg if tg else 0.0
    micro_f1 = 2.0 * mp * mr / (mp + mr) if mp + mr else 0.0

    by_k: dict[int, list[float]] = {}
    for r in rows:
        by_k.setdefault(r.k, []).append(r.f1)
    performance_by_k = sorted(
        (k, sum(v) / len(v)) for k, v in by_k.items()
    )

    failed_types = [r.entity_type for r in rows if r.f1 < success_threshold]

    insights = []
    if performance_by_k:
        min_k_f1 = performance_by_k[0][1]
        max_k_f1 = performance_by_k[-1][1]
        improvement = max_k_f1 - min_k_f1
        if improvement > 0.2:
            insights.append(
                f"Strong learning: +{improvement * 100.0:.0f}% F1 from K=1"
                f" to K={performance_by_k[-1][0]}"
            )
        elif improvement < 0.05:
            insights.append(
                "Minimal improvement with more examples - may need different"
                " approach"
            )
    if failed_types:
        head = failed_types[: min(len(failed_types), 3)]
        rendered = "[" + ", ".join(f'"{t}"' for t in head) + "]"
        insights.append(
            f"Struggling with {len(failed_types)} entity types: {rendered}"
        )
    if macro_f1 < 0.3:
        insights.append(
            "Low overall few-shot performance - consider pre-training on"
            " related data"
        )

    return FewShotResults(
        per_type=per_type,
        macro_f1=macro_f1,
        micro_f1=micro_f1,
        k_values=list(k_values),
        performance_by_k=performance_by_k,
        failed_types=failed_types,
        insights=insights,
    )


def simulate_few_shot_task(
    examples: DataFrame,
    entities: DataFrame,
    entity_type: str,
    k: int,
    max_queries: int,
) -> tuple[DataFrame, DataFrame] | None:
    """simulate_few_shot_task (few_shot.rs:344-393): split annotated
    examples (any with >=1 entity — the reference does not filter by
    type) into K support rows (example text + its FIRST entity span)
    and up to max_queries query-gold rows. ``examples``: (example_idx,
    text); ``entities``: (example_idx, entity_idx, text, start, end).
    Returns None when fewer than k+1 annotated examples exist."""
    firsts = entities.groupBy("example_idx").agg(
        F.min_by(
            F.struct("text", "start", "end"), "entity_idx"
        ).alias("_first"),
    )
    matching = examples.join(firsts, "example_idx").select(
        "example_idx",
        F.col("text").alias("full_text"),
        F.col("_first.text").alias("entity_text"),
        F.col("_first.start").alias("start"),
        F.col("_first.end").alias("end"),
    )
    if matching.limit(k + 1).count() < k + 1:
        return None

    ranked = (
        matching.orderBy("example_idx")
        .limit(k + max_queries)  # TakeOrdered bounds the window below
        .withColumn("_rn", F.row_number().over(Window.orderBy("example_idx")))
    )
    support = (
        ranked.where(F.col("_rn") <= k)
        .select(
            F.lit(entity_type).alias("entity_type"),
            F.col("full_text").alias("text"),
            "entity_text", "start", "end",
        )
    )
    query_ids = ranked.where(F.col("_rn") > k).select("example_idx")
    gold = entities.join(query_ids, "example_idx").select(
        F.lit(entity_type).alias("entity_type"),
        F.lit(k).alias("k"),
        F.col("example_idx").alias("text_id"),
        "text", "start", "end",
    )
    return support, gold

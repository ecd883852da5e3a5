"""Active-learning candidate selection (reference:
anno/src/eval/active_learning.rs:49-596).

Selects which unlabeled examples to annotate next, by one of five
strategies (SamplingStrategy, active_learning.rs:105-121): uncertainty
(lowest confidence), query-by-committee (vote-entropy disagreement,
:509-546), hybrid (0.7·uncertainty + 0.3·committee, :487-497), random
(seeded text-hash baseline, :320-333), and diversity (greedy
farthest-point over embeddings, :408-469). Strategies with unmet data
requirements fall back to uncertainty with an explicit warning
(resolve_strategy, :242-281).

Spark shape per strategy:

* uncertainty / hybrid / committee — scores are pure JVM expressions
  (higher-order array functions for the vote entropy), top-k is a
  TakeOrdered; no Python in the row path, works at any candidate count;
* random — the reference's wrapping ``acc*31 + byte`` fold is
  transcribed in an Arrow-batched pandas UDF (it is a parity hash, not
  a JVM-expressible one); the reference breaks ties with the
  candidate's LIST POSITION, which the port takes as an explicit
  ``idx`` column (a distributed table has no implicit order);
* diversity — greedy farthest-point is sequential in k by definition;
  the port collects (id, confidence, embedding) under a row gate
  (default 20k, like the engine's other small-k driver paths) and runs
  the transcribed loop; mean-pairwise diversity SCORES are an O(n²)
  self-join, same gate.

Quirks preserved:

* committee disagreement with <2 models falls back to 1−confidence
  per candidate (:510-513), distinct from the strategy-level fallback;
* Hybrid with no committee data anywhere still RUNS hybrid (the
  committee term just degenerates), only warning (:268-277);
* diversity scores normalize to [0,1] AFTER mixing in raw 1−confidence
  fallbacks for embedding-less candidates (:334-385);
* ScoreStats.max_score/min_score come from the DESC-sorted score list
  (first/last), so max is the best score (:235-238);
* estimate_budget returns Some(0) when the target is already met or
  the learning rate is non-positive (:575-596).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U64 = (1 << 64) - 1

UNCERTAINTY_WEIGHT = 0.7  # ActiveLearner default (:167-176)
DEFAULT_SEED = 42


# ---------------------------------------------------------------------------
# pure port (parity + the driver-side diversity loop)


def committee_disagreement(committee: list, confidence: float) -> float:
    """Vote entropy over entity types (:509-546): mean of 4p(1−p) per
    type; <2 models → 1−confidence; no types at all → 0.0."""
    if len(committee) < 2:
        return 1.0 - confidence
    all_types = {t for preds in committee for t in preds}
    if not all_types:
        return 0.0
    n = len(committee)
    total = 0.0
    for t in all_types:
        ratio = sum(1 for preds in committee if t in preds) / n
        total += 4.0 * ratio * (1.0 - ratio)
    return total / len(all_types)


def random_score(text: str, idx: int, seed: int = DEFAULT_SEED) -> float:
    """Seeded text-hash baseline (:320-333): wrapping u64 fold
    ``acc*31 + byte`` then ``(h + idx) % 1000 / 1000``."""
    h = seed & _U64
    for b in text.encode("utf-8"):
        h = (h * 31 + b) & _U64
    return ((h + idx) & _U64) % 1000 / 1000.0


def embedding_distance(a: list, b: list) -> float:
    """Euclidean; length mismatch → 0.0 (:547-559)."""
    if len(a) != len(b):
        return 0.0
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def diversity_scores(candidates: list) -> list:
    """Mean pairwise distance per candidate, min-max normalized;
    embedding-less candidates contribute raw 1−confidence BEFORE
    normalization (:334-385)."""
    n = len(candidates)
    if n == 0:
        return []
    scores = [0.0] * n
    for i, c in enumerate(candidates):
        emb_i = c.get("embedding")
        if emb_i is None:
            scores[i] = 1.0 - c["confidence"]
            continue
        total = 0.0
        count = 0
        for j, other in enumerate(candidates):
            if i == j:
                continue
            emb_j = other.get("embedding")
            if emb_j is not None:
                total += embedding_distance(emb_i, emb_j)
                count += 1
        scores[i] = total / count if count else 0.0
    lo, hi = min(scores), max(scores)
    if hi - lo > 0.0:
        scores = [(s - lo) / (hi - lo) for s in scores]
    return scores


def resolve_strategy(strategy: str, candidates: list) -> tuple:
    """(actual_strategy, warnings) per :242-281."""
    warnings = []
    if strategy == "diversity":
        missing = sum(1 for c in candidates if c.get("embedding") is None)
        if missing:
            warnings.append(
                f"Diversity sampling requires embeddings: {missing}/"
                f"{len(candidates)} candidates missing embeddings. "
                "Falling back to Uncertainty.")
            return "uncertainty", warnings
    elif strategy == "committee":
        missing = sum(1 for c in candidates
                      if len(c.get("committee") or []) < 2)
        if missing:
            warnings.append(
                "Query-by-Committee requires committee predictions "
                f"(>=2 models): {missing}/{len(candidates)} candidates "
                "missing. Falling back to Uncertainty.")
            return "uncertainty", warnings
    elif strategy == "hybrid":
        if not any(len(c.get("committee") or []) >= 2 for c in candidates):
            warnings.append(
                "Hybrid mode has no committee data. Using pure Uncertainty.")
    return strategy, warnings


def compute_scores(candidates: list, strategy: str,
                   uncertainty_weight: float = UNCERTAINTY_WEIGHT,
                   seed: int = DEFAULT_SEED) -> list:
    """compute_scores_with_strategy (:283-333); higher = pick first."""
    if strategy == "uncertainty":
        return [1.0 - c["confidence"] for c in candidates]
    if strategy == "committee":
        return [committee_disagreement(c.get("committee") or [],
                                       c["confidence"]) for c in candidates]
    if strategy == "diversity":
        return diversity_scores(candidates)
    if strategy == "hybrid":
        w = uncertainty_weight
        return [w * (1.0 - c["confidence"])
                + (1.0 - w) * committee_disagreement(c.get("committee") or [],
                                                     c["confidence"])
                for c in candidates]
    if strategy == "random":
        return [random_score(c["text"], i, seed)
                for i, c in enumerate(candidates)]
    raise ValueError(f"unknown strategy: {strategy}")


def select_by_diversity(candidates: list, k: int) -> list:
    """Greedy farthest-point sampling (:408-469): seed with the most
    uncertain candidate, then repeatedly add the candidate maximizing
    its minimum distance to the selected set. Returns indices."""
    if not all(c.get("embedding") is not None for c in candidates):
        order = sorted(range(len(candidates)),
                       key=lambda i: candidates[i]["confidence"])
        return order[:k]
    first = min(range(len(candidates)),
                key=lambda i: candidates[i]["confidence"], default=0)
    selected = [first]
    remaining = set(range(len(candidates))) - {first}
    while len(selected) < k and remaining:
        best_idx, best_min = 0, -math.inf
        for idx in remaining:
            min_dist = min(
                (embedding_distance(candidates[idx]["embedding"],
                                    candidates[s]["embedding"])
                 for s in selected), default=0.0)
            if min_dist > best_min:
                best_min, best_idx = min_dist, idx
        selected.append(best_idx)
        remaining.discard(best_idx)
    return selected


def select(candidates: list, k: int, strategy: str = "uncertainty",
           uncertainty_weight: float = UNCERTAINTY_WEIGHT,
           seed: int = DEFAULT_SEED) -> list:
    """ActiveLearner::select (:190-206): top-k candidate indices."""
    if not candidates or k == 0:
        return []
    k = min(k, len(candidates))
    actual, _ = resolve_strategy(strategy, candidates)
    if actual == "diversity":
        return select_by_diversity(candidates, k)
    if actual == "uncertainty":
        order = sorted(range(len(candidates)),
                       key=lambda i: candidates[i]["confidence"])
        return order[:k]
    scores = compute_scores(candidates, actual, uncertainty_weight, seed)
    order = sorted(range(len(candidates)), key=lambda i: -scores[i])
    return order[:k]


def select_with_scores(candidates: list, k: int,
                       strategy: str = "uncertainty",
                       uncertainty_weight: float = UNCERTAINTY_WEIGHT,
                       seed: int = DEFAULT_SEED) -> dict:
    """SelectionResult port (:208-240)."""
    actual, warnings = resolve_strategy(strategy, candidates)
    scores = compute_scores(candidates, actual, uncertainty_weight, seed)
    order = sorted(range(len(candidates)), key=lambda i: -scores[i])
    k = min(k, len(candidates))
    selected = [(candidates[i]["text"], scores[i]) for i in order[:k]]
    all_sorted = [scores[i] for i in order]
    mean_all = sum(all_sorted) / max(len(all_sorted), 1)
    mean_selected = sum(s for _, s in selected) / max(k, 1)
    return {
        "selected": selected,
        "total_candidates": len(candidates),
        "strategy": strategy,
        "actual_strategy": actual,
        "score_stats": {
            "mean_selected": mean_selected,
            "mean_all": mean_all,
            "max_score": all_sorted[0] if all_sorted else 0.0,
            "min_score": all_sorted[-1] if all_sorted else 0.0,
        },
        "warnings": warnings,
    }


def estimate_budget(current_f1: float, target_f1: float,
                    current_samples: int, f1_per_100_samples: float) -> int:
    """Linear annotation-budget extrapolation (:575-596)."""
    if target_f1 <= current_f1 or f1_per_100_samples <= 0.0:
        return 0
    hundreds = (target_f1 - current_f1) / f1_per_100_samples
    return math.ceil(hundreds * 100.0)


# ---------------------------------------------------------------------------
# Spark path

MAX_DRIVER_CANDIDATES = 20_000


def committee_disagreement_col(committee: Column, confidence: Column) -> Column:
    """The vote entropy as pure JVM higher-order functions: flatten the
    committee's type lists, count per-type votes with filter(), average
    4p(1−p). Whole-stage codegen, no Python."""
    types = F.array_distinct(F.flatten(committee))
    n = F.size(committee)
    per_type = F.transform(
        types,
        lambda t: F.size(F.filter(committee, lambda p: F.array_contains(p, t)))
        / n.cast("double"),
    )
    entropy = F.aggregate(
        F.transform(per_type, lambda r: 4.0 * r * (1.0 - r)),
        F.lit(0.0), lambda acc, d: acc + d,
    ) / F.size(types)
    return (
        F.when(F.coalesce(F.size(committee), F.lit(0)) < 2, 1.0 - confidence)
        .when(F.size(types) == 0, F.lit(0.0))
        .otherwise(entropy)
    )


def score_candidates(df: DataFrame, strategy: str,
                     uncertainty_weight: float = UNCERTAINTY_WEIGHT,
                     seed: int = DEFAULT_SEED) -> DataFrame:
    """Add a ``score`` column (higher = annotate first). Expects columns
    text, confidence [, committee array<array<string>>, idx long]."""
    if strategy == "uncertainty":
        return df.withColumn("score", 1.0 - F.col("confidence"))
    if strategy == "committee":
        return df.withColumn(
            "score",
            committee_disagreement_col(F.col("committee"), F.col("confidence")))
    if strategy == "hybrid":
        w = uncertainty_weight
        return df.withColumn(
            "score",
            w * (1.0 - F.col("confidence"))
            + (1.0 - w) * committee_disagreement_col(F.col("committee"),
                                                     F.col("confidence")))
    if strategy == "random":
        @F.pandas_udf("double")
        def _rand(text: pd.Series, idx: pd.Series) -> pd.Series:
            return pd.Series([
                random_score(t, int(i), seed)
                for t, i in zip(text, idx)
            ])
        return df.withColumn("score", _rand(F.col("text"), F.col("idx")))
    raise ValueError(f"unsupported distributed strategy: {strategy}")


def select_topk(df: DataFrame, k: int, strategy: str = "uncertainty",
                uncertainty_weight: float = UNCERTAINTY_WEIGHT,
                seed: int = DEFAULT_SEED) -> DataFrame:
    """Distributed top-k selection — a TakeOrdered over the score
    column (never a full sort materialization)."""
    scored = score_candidates(df, strategy, uncertainty_weight, seed)
    return scored.orderBy(F.desc("score")).limit(k)


def select_diverse(df: DataFrame, k: int,
                   max_rows: int = MAX_DRIVER_CANDIDATES) -> DataFrame:
    """Greedy farthest-point selection. Sequential in k, so the
    candidate pool is collected under a row gate (annotation batches
    are small by construction); refuse larger pools rather than
    silently running an O(n·k) driver loop."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"select_diverse is a driver-side FPS loop gated at "
            f"{max_rows} candidates; pre-filter the pool (e.g. "
            f"uncertainty top-{max_rows}) first")
    cands = [{"confidence": r["confidence"],
              "embedding": list(r["embedding"]) if r["embedding"] is not None
              else None}
             for r in rows]
    chosen = set(select_by_diversity(cands, k))
    spark = df.sparkSession
    keep = [rows[i] for i in sorted(chosen)]
    return spark.createDataFrame(keep, df.schema)

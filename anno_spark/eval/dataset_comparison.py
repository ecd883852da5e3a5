"""Dataset comparison and difficulty estimation (reference:
anno/src/eval/dataset_comparison.rs:1-635; the ``discourse``
feature-gated section (:462-560) depends on the out-of-scope
abstract-anaphora module and is gated out here exactly as the
reference's default feature set gates it).

Per-dataset statistics (type distribution, vocabulary, entity length
moments, diversity — compute_stats, dataset_comparison.rs:104-197),
two-dataset comparison (Jensen-Shannon type divergence, vocabulary /
entity-text Jaccard, domain-gap heuristic, transfer recommendations —
compare_datasets, :200-283), and heuristic difficulty estimation
(estimate_difficulty, :373-427).

Distributed shape: vocab and entity sets are distinct-count joins;
entity-length stats reduce through a token-length HISTOGRAM (≤ ~100
distinct lengths) so the exact reference order statistics — upper
median ``sorted[n/2]``, population std — come off a tiny aggregate,
never a sorted materialization; the JS divergence is arithmetic over
the per-type distribution tables. 10^9 examples reduce to rows
bounded by |types| + |distinct lengths|.

Quirks preserved:

* entity token count floors at 1 (``.max(1)``,
  dataset_comparison.rs:144-145);
* median is the UPPER median ``sorted[len/2]`` — not interpolated
  (:169);
* std dev is population (÷ n), not sample (:170-176);
* empty datasets: diversity 1.0, all else 0 (:106-122); empty unions:
  both Jaccards 1.0 (:227-240); empty key union: JS 0.0 (:288-291);
* domain gap = 0.4·JS + 0.3·(1−vocab) + 0.3·(1−entity overlap) (:256-258);
* the difficulty score can go NEGATIVE (low diversity subtracts 0.1)
  before the Easy/<0.2 bucketing; only the REPORTED score clamps to
  [0,1] (:406-427);
* ``types_only_in_*`` come from HashSet difference — unspecified
  order in the reference; the port sorts them (documented
  determinism fix), and the recommendation strings render the Rust
  ``{:?}`` list format.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Lowercased whitespace tokens, one per row (split_whitespace
    semantics: no empty tokens)."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), _WS)).alias("token")
        )
        .where(F.col("token") != "")
        .select(F.lower("token").alias("token"))
    )


def _tok_len(text_col: str):
    """split_whitespace().count().max(1) (dataset_comparison.rs:144-145)."""
    n = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), _WS), lambda t: t != "")
    )
    return F.greatest(n, F.lit(1))


def type_distribution(entities: DataFrame) -> DataFrame:
    """(entity_type, proportion, n) over total entities
    (dataset_comparison.rs:150-154)."""
    counts = entities.groupBy("entity_type").agg(F.count("*").alias("n"))
    total = entities.count()
    return counts.select(
        "entity_type",
        (F.col("n") / F.lit(max(total, 1))).alias("proportion"),
        "n",
    )


_STATS_SCHEMA = (
    "num_examples long, num_entities long, n_types long,"
    " avg_entities_per_example double, vocab_size long,"
    " unique_entity_texts long, entity_diversity double,"
    " len_mean double, len_median double, len_std double,"
    " len_min long, len_max long"
)


def dataset_stats(examples: DataFrame, entities: DataFrame) -> DataFrame:
    """ONE-row DatasetStats (compute_stats,
    dataset_comparison.rs:104-197). ``examples``: (example_id, text);
    ``entities``: (example_id, text, entity_type)."""
    spark = examples.sparkSession
    num_examples = examples.count()
    if num_examples == 0:
        return spark.createDataFrame(
            [(0, 0, 0, 0.0, 0, 0, 1.0, 0.0, 0.0, 0.0, 0, 0)], _STATS_SCHEMA
        )

    num_entities = entities.count()
    n_types = entities.select("entity_type").distinct().count()
    vocab_size = _tokens(examples, "text").distinct().count()
    unique_texts = entities.select(F.lower("text")).distinct().count()

    # token-length histogram: exact order stats off <= ~100 rows
    hist = (
        entities.select(_tok_len("text").alias("len"))
        .groupBy("len")
        .agg(F.count("*").alias("cnt"))
        .orderBy("len")
        .collect()
    )
    if not hist:
        mean = median = std = 0.0
        lo = hi = 0
    else:
        n = sum(r.cnt for r in hist)
        mean = sum(r.len * r.cnt for r in hist) / n
        var = sum(r.cnt * (r.len - mean) ** 2 for r in hist) / n
        std = math.sqrt(var)
        lo, hi = hist[0].len, hist[-1].len
        # upper median: element at 0-based index n // 2
        target = n // 2
        seen = 0
        median = float(hist[-1].len)
        for r in hist:
            if seen + r.cnt > target:
                median = float(r.len)
                break
            seen += r.cnt

    return spark.createDataFrame(
        [(
            num_examples, num_entities, n_types,
            num_entities / num_examples, vocab_size, unique_texts,
            unique_texts / max(num_entities, 1), mean, median, std, lo, hi,
        )],
        _STATS_SCHEMA,
    )


def _jaccard(a: DataFrame, b: DataFrame, col: str) -> float:
    """|A∩B| / |A∪B| over distinct values, 1.0 on empty union
    (dataset_comparison.rs:224-240)."""
    da, db = a.select(col).distinct(), b.select(col).distinct()
    inter = da.join(db, col).count()
    union = da.unionByName(db).distinct().count()
    return inter / union if union else 1.0


def js_divergence(dist_a: DataFrame, dist_b: DataFrame) -> float:
    """Jensen-Shannon divergence of two type_distribution frames,
    normalized by ln 2 (jensen_shannon_divergence,
    dataset_comparison.rs:285-330) — arithmetic over the |types|-row
    join."""
    j = (
        dist_a.select("entity_type", F.col("proportion").alias("p"))
        .join(
            dist_b.select("entity_type", F.col("proportion").alias("q")),
            "entity_type",
            "full_outer",
        )
        .select(
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("q", F.lit(0.0)).alias("q"),
        )
        .withColumn("m", (F.col("p") + F.col("q")) / 2.0)
        .agg(
            F.sum(
                F.when(
                    F.col("p") > 0.0,
                    F.col("p") * F.log(F.col("p") / F.col("m")),
                ).otherwise(0.0)
                + F.when(
                    F.col("q") > 0.0,
                    F.col("q") * F.log(F.col("q") / F.col("m")),
                ).otherwise(0.0)
            ).alias("kl_sum"),
        )
        .collect()[0]
    )
    if j.kl_sum is None:  # empty key union (dataset_comparison.rs:288-291)
        return 0.0
    return (j.kl_sum / 2.0) / math.log(2.0)


@dataclass
class DifficultyEstimate:
    """dataset_comparison.rs:445-455."""

    difficulty: str  # Easy | Medium | Hard | VeryHard
    score: float
    factors: list[str] = field(default_factory=list)


def estimate_difficulty(stats) -> DifficultyEstimate:
    """estimate_difficulty (dataset_comparison.rs:373-427) over a
    collected dataset_stats row."""
    factors = []
    score = 0.0
    if stats.n_types > 10:
        factors.append("Many entity types (>10)")
        score += 0.2
    elif stats.n_types > 5:
        factors.append("Moderate entity types (5-10)")
        score += 0.1
    if stats.len_mean > 3.0:
        factors.append("Long average entity length (>3 tokens)")
        score += 0.2
    if stats.len_std > 2.0:
        factors.append("High entity length variance")
        score += 0.1
    if stats.entity_diversity > 0.9:
        factors.append("High entity diversity (few repeated entities)")
        score += 0.2
    elif stats.entity_diversity < 0.3:
        factors.append("Low entity diversity (model can memorize)")
        score -= 0.1
    if stats.avg_entities_per_example < 1.0:
        factors.append("Few entities per example (<1 avg)")
        score += 0.1

    if score < 0.2:
        difficulty = "Easy"
    elif score < 0.4:
        difficulty = "Medium"
    elif score < 0.6:
        difficulty = "Hard"
    else:
        difficulty = "VeryHard"
    return DifficultyEstimate(
        difficulty, min(max(score, 0.0), 1.0), factors
    )


def _rust_vec_debug(items: list[str]) -> str:
    """Rust {:?} for Vec<String>: ["a", "b"]."""
    return "[" + ", ".join(f'"{s}"' for s in items) + "]"


def comparison_recommendations(
    type_div: float,
    vocab_overlap: float,
    entity_overlap: float,
    types_only_a: list[str],
    types_only_b: list[str],
) -> list[str]:
    """generate_recommendations (dataset_comparison.rs:332-370)."""
    recs = []
    if type_div > 0.5:
        recs.append(
            "High type distribution divergence - consider domain adaptation"
        )
    elif type_div > 0.2:
        recs.append(
            "Moderate type divergence - transfer learning may require"
            " fine-tuning"
        )
    if vocab_overlap < 0.3:
        recs.append("Low vocabulary overlap - domains use different terminology")
    if entity_overlap < 0.1:
        recs.append(
            "Very few shared entities - gazetteer transfer unlikely to help"
        )
    if types_only_a:
        recs.append(
            f"Types in source only: {_rust_vec_debug(types_only_a)} - target"
            " may not need these"
        )
    if types_only_b:
        recs.append(
            f"Types in target only: {_rust_vec_debug(types_only_b)} - source"
            " cannot help with these"
        )
    if not recs:
        recs.append("Datasets appear compatible for transfer learning")
    return recs


@dataclass
class DatasetComparison:
    """compare_datasets output (dataset_comparison.rs:78-101) —
    config-bounded scalars collected from the distributed jobs."""

    stats_a: object
    stats_b: object
    type_divergence: float
    vocab_overlap: float
    entity_text_overlap: float
    types_only_in_a: list[str]
    types_only_in_b: list[str]
    estimated_domain_gap: float
    recommendations: list[str] = field(default_factory=list)


def compare_datasets(
    examples_a: DataFrame,
    entities_a: DataFrame,
    examples_b: DataFrame,
    entities_b: DataFrame,
) -> DatasetComparison:
    """compare_datasets (dataset_comparison.rs:200-283)."""
    stats_a = dataset_stats(examples_a, entities_a).collect()[0]
    stats_b = dataset_stats(examples_b, entities_b).collect()[0]

    vocab_overlap = _jaccard(
        _tokens(examples_a, "text"), _tokens(examples_b, "text"), "token"
    )
    ea = entities_a.select(F.lower("text").alias("etext"))
    eb = entities_b.select(F.lower("text").alias("etext"))
    entity_overlap = _jaccard(ea, eb, "etext")

    dist_a = type_distribution(entities_a)
    dist_b = type_distribution(entities_b)
    type_div = js_divergence(dist_a, dist_b)

    ta = dist_a.select("entity_type")
    tb = dist_b.select("entity_type")
    only_a = sorted(
        r.entity_type for r in ta.join(tb, "entity_type", "left_anti").collect()
    )
    only_b = sorted(
        r.entity_type for r in tb.join(ta, "entity_type", "left_anti").collect()
    )

    gap = (
        0.4 * type_div
        + 0.3 * (1.0 - vocab_overlap)
        + 0.3 * (1.0 - entity_overlap)
    )
    return DatasetComparison(
        stats_a=stats_a,
        stats_b=stats_b,
        type_divergence=type_div,
        vocab_overlap=vocab_overlap,
        entity_text_overlap=entity_overlap,
        types_only_in_a=only_a,
        types_only_in_b=only_b,
        estimated_domain_gap=gap,
        recommendations=comparison_recommendations(
            type_div, vocab_overlap, entity_overlap, only_a, only_b
        ),
    )

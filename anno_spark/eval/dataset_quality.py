"""Statistical dataset-quality metrics (reference:
anno/src/eval/dataset_quality.rs:1-544; Statistical Dataset
Evaluation, Cambridge NLP 2022 — Classical Test Theory applied to NER
datasets).

Reliability (redundancy, train→test leakage), Difficulty (unseen
entity ratio, surface-form label ambiguity, entity density per 100
tokens), Validity (type imbalance, entity-null token rate, entities
per sample), plus a graded report with exact recommendation strings
(compute_grade_and_recommendations, dataset_quality.rs:331-401).

Distributed shape: every metric is a GLOBAL aggregate — no per-doc
alignment is needed, so the whole report is distinct/join/groupBy over
the docs and mentions tables and runs unchanged on a 10¹²-token
corpus. Tokenization is Rust ``split_whitespace`` parity: non-empty
whitespace-separated chunks, computed JVM-side.

Inputs: ``docs`` frames need a ``text`` column (one row per sample);
``ents`` frames need ``text`` (the surface) and ``entity_type`` —
exactly what the engine's mentions_table produces.

Quirks preserved:

* redundancy counts duplicate OCCURRENCES (total − distinct) over
  lowercased texts (dataset_quality.rs:145-160);
* leakage is per test ROW, matched on lowercased full text
  (dataset_quality.rs:163-180);
* unseen ratio is per test-entity OCCURRENCE vs distinct lowercased
  train surfaces (dataset_quality.rs:195-216);
* ambiguity pools train AND test, ratio over DISTINCT surfaces
  (dataset_quality.rs:219-240);
* ``entity_imbalance`` is +∞ when the rarest type has count 0 — i.e.
  whenever train has no entities (the (0,0) branch,
  dataset_quality.rs:279-295) — while the standalone
  :func:`entity_imbalance_ratio` utility returns 1.0 on empty input
  (dataset_quality.rs:427-445); both behaviors kept;
* ``entity_null_rate`` is 1.0 on an empty-token corpus and can go
  NEGATIVE when entity surfaces overlap (the reference's "rough
  estimate" double-counts, dataset_quality.rs:297-320);
* ``ambiguous_examples`` keeps 5 of the ambiguous surfaces — HashMap
  order in the reference; the port takes the 5 lexicographically
  smallest with sorted label lists (deterministic choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = "size(filter(split(text, '\\\\s+'), x -> x != ''))"


def _tokens_col():
    return F.expr(_TOKENS)


def dataset_quality_report(
    train_docs: DataFrame,
    train_ents: DataFrame,
    test_docs: DataFrame,
    test_ents: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """DatasetQualityAnalyzer::analyze (dataset_quality.rs:118-137).

    Returns ``(summary, type_distribution, ambiguous_examples)``:
    summary is ONE row with every scalar metric; type_distribution is
    (entity_type, count) over train; ambiguous_examples is
    (surface, labels array, n_labels) — ALL ambiguous surfaces, the
    caller slices 5 for display (grade_and_recommendations needs only
    the scalars).
    """
    # --- reliability -----------------------------------------------
    rel = train_docs.agg(
        F.count("*").alias("n_train"),
        F.countDistinct(F.lower("text")).alias("_distinct_train"),
    ).select(
        "n_train",
        (F.col("n_train") - F.col("_distinct_train")).alias("duplicate_count"),
        F.when(
            F.col("n_train") > 0,
            (F.col("n_train") - F.col("_distinct_train")) / F.col("n_train"),
        )
        .otherwise(0.0)
        .alias("redundancy"),
    )
    train_text_set = train_docs.select(F.lower("text").alias("t")).distinct()
    leak = (
        test_docs.select(F.lower("text").alias("t"))
        .join(train_text_set.withColumn("_hit", F.lit(1)), "t", "left")
        .agg(
            F.count("*").alias("n_test"),
            F.coalesce(
                F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)), F.lit(0)
            ).alias("leaked_count"),
        )
        .select(
            "n_test",
            "leaked_count",
            F.when(F.col("n_test") > 0, F.col("leaked_count") / F.col("n_test"))
            .otherwise(0.0)
            .alias("leakage_ratio"),
        )
    )

    # --- difficulty --------------------------------------------------
    train_surfaces = train_ents.select(F.lower("text").alias("s")).distinct()
    unseen = (
        test_ents.select(F.lower("text").alias("s"))
        .join(train_surfaces.withColumn("_hit", F.lit(1)), "s", "left")
        .agg(
            F.count("*").alias("_n_test_ents"),
            F.coalesce(
                F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)), F.lit(0)
            ).alias("unseen_entity_count"),
        )
        .select(
            "unseen_entity_count",
            F.when(
                F.col("_n_test_ents") > 0,
                F.col("unseen_entity_count") / F.col("_n_test_ents"),
            )
            .otherwise(0.0)
            .alias("unseen_entity_ratio"),
        )
    )
    pooled = train_ents.select(
        F.lower("text").alias("surface"), F.col("entity_type").alias("label")
    ).unionByName(
        test_ents.select(
            F.lower("text").alias("surface"), F.col("entity_type").alias("label")
        )
    )
    per_surface = pooled.groupBy("surface").agg(
        F.sort_array(F.collect_set("label")).alias("labels")
    )
    ambiguous_examples = (
        per_surface.where(F.size("labels") > 1)
        .select("surface", "labels", F.size("labels").alias("n_labels"))
    )
    ambiguity = per_surface.agg(
        F.count("*").alias("_n_surfaces"),
        F.coalesce(
            F.sum(F.when(F.size("labels") > 1, 1).otherwise(0)), F.lit(0)
        ).alias("_n_ambiguous"),
    ).select(
        "_n_ambiguous",
        F.when(
            F.col("_n_surfaces") > 0, F.col("_n_ambiguous") / F.col("_n_surfaces")
        )
        .otherwise(0.0)
        .alias("entity_ambiguity"),
    )
    train_tokens = train_docs.agg(
        F.coalesce(F.sum(_tokens_col()), F.lit(0)).alias("_total_tokens")
    )
    train_ent_stats = train_ents.agg(
        F.count("*").alias("_total_entities"),
        F.coalesce(F.sum(_tokens_col()), F.lit(0)).alias("_entity_tokens"),
    )

    # --- validity ----------------------------------------------------
    type_distribution = train_ents.groupBy("entity_type").agg(
        F.count("*").alias("count")
    )
    imbalance = type_distribution.agg(
        F.coalesce(F.max("count"), F.lit(0)).alias("_max_t"),
        F.coalesce(F.min("count"), F.lit(0)).alias("_min_t"),
    ).select(
        F.when(F.col("_min_t") > 0, F.col("_max_t") / F.col("_min_t"))
        .otherwise(F.lit(float("inf")))
        .alias("entity_imbalance")
    )

    summary = (
        rel.crossJoin(leak)
        .crossJoin(unseen)
        .crossJoin(ambiguity)
        .crossJoin(train_tokens)
        .crossJoin(train_ent_stats)
        .crossJoin(imbalance)
        .select(
            # reliability
            "redundancy",
            "duplicate_count",
            "leakage_ratio",
            "leaked_count",
            # difficulty
            "unseen_entity_ratio",
            "unseen_entity_count",
            "entity_ambiguity",
            F.col("_n_ambiguous").alias("ambiguous_count"),
            F.when(
                F.col("_total_tokens") > 0,
                F.col("_total_entities") / F.col("_total_tokens") * 100.0,
            )
            .otherwise(0.0)
            .alias("entity_density"),
            # validity
            "entity_imbalance",
            F.when(
                F.col("_total_tokens") > 0,
                1.0 - F.col("_entity_tokens") / F.col("_total_tokens"),
            )
            .otherwise(1.0)
            .alias("entity_null_rate"),
            F.when(
                F.col("n_train") > 0, F.col("_total_entities") / F.col("n_train")
            )
            .otherwise(0.0)
            .alias("avg_entities_per_sample"),
            "n_train",
            "n_test",
        )
    )
    return summary, type_distribution, ambiguous_examples


def grade_and_recommendations(summary_row) -> tuple[str, list[str]]:
    """compute_grade_and_recommendations (dataset_quality.rs:331-401):
    exact deduction amounts, thresholds, format strings, and grade
    bands, from one collected summary row."""
    s = summary_row
    issues: list[str] = []
    score = 100
    if s["redundancy"] > 0.1:
        issues.append(
            f"High redundancy ({s['redundancy'] * 100.0:.1f}%): "
            "Remove duplicates from training data"
        )
        score -= 15
    if s["leakage_ratio"] > 0.01:
        issues.append(
            f"Data leakage detected ({s['leakage_ratio'] * 100.0:.1f}%): "
            f"{s['leaked_count']} test samples appear in training"
        )
        score -= 25
    if s["unseen_entity_ratio"] > 0.5:
        issues.append(
            f"High unseen entity ratio ({s['unseen_entity_ratio'] * 100.0:.1f}%): "
            "Test set may be too different from training"
        )
        score -= 10
    if s["entity_ambiguity"] > 0.1:
        issues.append(
            f"Entity ambiguity ({s['entity_ambiguity'] * 100.0:.1f}%): "
            "Some entities have multiple labels - review guidelines"
        )
        score -= 10
    if s["entity_imbalance"] > 10.0:
        issues.append(
            f"Severe class imbalance ({s['entity_imbalance']:.1f}x): "
            "Consider oversampling rare entity types"
        )
        score -= 15
    if s["entity_null_rate"] > 0.95:
        issues.append(
            f"Very sparse entities ({s['entity_null_rate'] * 100.0:.1f}% null): "
            "May need more annotated data"
        )
        score -= 10
    if 90 <= score <= 100:
        grade = "A (Excellent)"
    elif 80 <= score <= 89:
        grade = "B (Good)"
    elif 70 <= score <= 79:
        grade = "C (Acceptable)"
    elif 60 <= score <= 69:
        grade = "D (Needs Improvement)"
    else:
        grade = "F (Critical Issues)"
    return grade, issues


def check_leakage(train_texts: DataFrame, test_texts: DataFrame) -> DataFrame:
    """Quick leakage check (dataset_quality.rs:406-424): ONE row
    (leaked_count, leakage_ratio) from two single-column text frames."""
    train_set = train_texts.select(F.lower("text").alias("t")).distinct()
    return (
        test_texts.select(F.lower("text").alias("t"))
        .join(train_set.withColumn("_hit", F.lit(1)), "t", "left")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)), F.lit(0)
            ).alias("leaked_count"),
            F.count("*").alias("_n"),
        )
        .select(
            "leaked_count",
            F.when(F.col("_n") > 0, F.col("leaked_count") / F.col("_n"))
            .otherwise(0.0)
            .alias("leakage_ratio"),
        )
    )


def entity_imbalance_ratio(entity_types: DataFrame) -> DataFrame:
    """entity_imbalance_ratio utility (dataset_quality.rs:427-445):
    max/min count over an ``entity_type`` column; 1.0 on EMPTY input
    (unlike the report's ∞ — both are reference behavior)."""
    return (
        entity_types.groupBy("entity_type")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("_max"), F.min("c").alias("_min"), F.count("*").alias("_k"))
        .select(
            F.when(F.col("_k") == 0, F.lit(1.0))
            .when(F.col("_min") > 0, F.col("_max") / F.col("_min"))
            .otherwise(F.lit(float("inf")))
            .alias("imbalance")
        )
    )

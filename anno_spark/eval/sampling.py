"""Sampling strategies for NER evaluation (reference:
anno/src/eval/sampling.rs:1-314).

Hash-ordered deterministic sampling (stratified_sample,
sampling.rs:62-90), type-stratified sampling with proportional
per-group allocation (stratified_sample_ner, sampling.rs:117-177), and
multi-seed variance aggregation (multi_seed_eval, sampling.rs:206-238).

Distributed shape: the reference's hash-based pseudo-shuffle becomes
``xxhash64`` ordering — computed JVM-side per row, so "shuffle and
take k" is a TakeOrdered heap (no full sort materialized) and the
per-type allocation is a window rank against a broadcast allocation
map. 10^9 cases sample in one pass; only group counts (≤ #types rows)
ever reduce to the driver.

Quirks preserved:

* ``cases.len() <= target_size`` short-circuits to the identity
  (sampling.rs:68-70, 124-126);
* the NER path groups by the FIRST gold entity's (optionally
  type-mapper-normalized) type, "EMPTY" for entity-less cases
  (sampling.rs:131-147);
* per-group allocation is ceil(share × target), so Σ allocations can
  overshoot; the overflow trim re-ranks by the SAME per-case hash the
  group shuffle used (hash_shuffle hashes (seed, idx) in both places,
  sampling.rs:154-172) — reproduced exactly: one hash column drives
  both stages;
* output preserves original case order (final sort by id,
  sampling.rs:88-89, 174-176);
* sample standard deviation (n−1), zeros on empty seed list
  (sampling.rs:217-237).

Port deviation (documented): the reference hashes with std
DefaultHasher, which Rust documents as unstable across releases — no
canonical ordering exists to match. The port uses Spark's xxhash64
with the seed as the leading column: equally deterministic, different
permutation. The plain sampler hashes (seed, id, text)
(sampling.rs:74-83); the NER path hashes (seed, id) only.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    cases: DataFrame,
    target_size: int,
    seed: int,
    id_col: str = "case_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic hash-ordered subsample of ``target_size`` cases,
    original order preserved (sampling.rs:62-90)."""
    if cases.limit(target_size + 1).count() <= target_size:
        return cases
    h = F.xxhash64(F.lit(seed), F.col(id_col), F.col(text_col))
    return (
        cases.withColumn("_h", h)
        .orderBy("_h", id_col)
        .limit(target_size)
        .drop("_h")
        .orderBy(id_col)
    )


def _dominant_type(cases, gold, mapper, id_col):
    """First gold entity's (normalized) type per case, "EMPTY" when the
    case has none (sampling.rs:131-147)."""
    from anno_spark.operators.schema_map import normalize_labels_expr

    label = (
        normalize_labels_expr(F.col("original_label"), mapper=mapper)
        if mapper is not None
        else F.col("entity_type")
    )
    firsts = (
        gold.withColumn("_lbl", label)
        .groupBy(id_col)
        .agg(F.min_by("_lbl", "entity_idx").alias("_type_key"))
    )
    return cases.join(firsts, id_col, "left").withColumn(
        "_type_key", F.coalesce("_type_key", F.lit("EMPTY"))
    )


def stratified_sample_ner(
    cases: DataFrame,
    gold: DataFrame,
    target_size: int,
    seed: int,
    mapper=None,
    id_col: str = "case_id",
) -> DataFrame:
    """Type-stratified subsample: proportional ceil allocation per
    dominant-type group, hash-ranked within groups, same-hash trim on
    overshoot, original order restored (sampling.rs:117-177).
    ``mapper``: an operators.schema_map.TypeMapper normalizing
    ``gold.original_label``."""
    total = cases.count()
    if total <= target_size:
        return cases

    keyed = _dominant_type(cases, gold, mapper, id_col).withColumn(
        "_h", F.xxhash64(F.lit(seed), F.col(id_col))
    )

    alloc = (
        keyed.groupBy("_type_key")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_alloc",
            F.ceil(F.col("_n") / F.lit(float(total)) * F.lit(target_size)),
        )
        .select("_type_key", "_alloc")
    )

    w = Window.partitionBy("_type_key").orderBy("_h", id_col)
    stage1 = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(alloc), "_type_key")
        .where(F.col("_rn") <= F.col("_alloc"))
    )

    # ceil-overshoot trim re-uses the SAME per-case hash (sampling.rs:166-170)
    trimmed = stage1.orderBy("_h", id_col).limit(target_size)
    return trimmed.drop("_type_key", "_h", "_rn", "_alloc").orderBy(id_col)


def multi_seed_eval(
    eval_fn: Callable[[int], float], seeds: Sequence[int]
) -> tuple[float, float, float, float]:
    """(mean, std_dev, min, max) of eval_fn over seeds — sample std
    with n−1, all zeros on an empty seed list (sampling.rs:206-238)."""
    if not seeds:
        return (0.0, 0.0, 0.0, 0.0)
    scores = [eval_fn(s) for s in seeds]
    mean = sum(scores) / len(scores)
    lo, hi = min(scores), max(scores)
    var = (
        sum((x - mean) ** 2 for x in scores) / (len(scores) - 1)
        if len(scores) > 1
        else 0.0
    )
    return (mean, var**0.5, lo, hi)

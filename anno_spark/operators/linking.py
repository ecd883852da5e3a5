"""M4 — entity linking: blocked candidate generation scored with TF-IDF
cosine + prior features (the north-star upgrade over the reference's
plain string similarity, SURVEY §2.6 X3; reference cosine at
anno/src/backends/inference.rs:1964-1974, demo KB at
anno/src/cli/utils.rs:555-625).

Fully relational sparse TF-IDF: a vector is a posting table
(key, gram, weight); cosine of a candidate pair is a join on gram + a
groupBy sum — no ml.Vector UDFs, whole plan stays in Catalyst.

Scale shape: the KB side (aliases + postings) is small → broadcast on
every join; candidate generation reuses the MinHash/LSH band machinery
so the mention side is blocked, never cross-joined. The surface side is
already the deduplicated distinct-surface table, so hot surfaces ("the
company") are single rows — the skew that would otherwise need salting
was removed structurally; the remaining map-side joins are broadcasts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .resolve import band_table


def _gram_postings(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """(key, gram, tf) — char 3-gram term frequencies of lower(text),
    computed JVM-side (transform over an index sequence + substring);
    texts shorter than 3 chars contribute the whole text as one gram
    (minhash.extract_ngrams semantics, cdcr.rs:371-381)."""
    t = F.lower(F.col(text_col))
    gram_arr = F.when(
        F.length(t) < 3, F.array(t)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        )
    )
    grams = df.select(
        F.col(key_col).alias("key"), F.explode(gram_arr).alias("gram")
    )
    return grams.groupBy("key", "gram").agg(F.count("*").alias("tf"))


def build_kb_index(spark: SparkSession, kb_aliases: DataFrame) -> dict:
    """kb_aliases: (alias, kb_id, description[, prior]) →
    {"postings": broadcastable TF-IDF postings, "idf": gram→idf,
     "aliases": alias dimension}. IDF fitted on the alias corpus:
    idf = ln((N+1)/(df+1)) + 1 (smoothed)."""
    aliases = kb_aliases.withColumn("alias_id", F.xxhash64("alias", "kb_id"))
    n = aliases.count()
    tf = _gram_postings(aliases, "alias_id", "alias")
    df_counts = tf.groupBy("gram").agg(F.countDistinct("key").alias("df"))
    idf = df_counts.select(
        "gram",
        (F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    w = tf.join(idf, "gram").select(
        "key", "gram", ((1.0 + F.log("tf")) * F.col("idf")).alias("w")
    )
    norms = w.groupBy("key").agg(F.sqrt(F.sum(F.col("w") ** 2)).alias("norm"))
    postings = w.join(norms, "key").select(
        F.col("key").alias("alias_id"),
        "gram",
        (F.col("w") / F.col("norm")).alias("w_alias"),
    )
    return {
        "postings": postings.localCheckpoint(),
        "idf": idf.localCheckpoint(),
        "aliases": aliases.localCheckpoint(),
    }


def link_candidates(surfaces: DataFrame, kb_index: dict) -> DataFrame:
    """LSH-blocked candidate generation: band join surface↔alias
    (broadcast KB side) → distinct (key_id, alias_id)."""
    aliases = kb_index["aliases"]
    alias_for_bands = aliases.select(
        F.col("alias_id").alias("key_id"),
        F.col("alias").alias("surface"),
        F.lit("").alias("entity_type"),
    )
    surf_bands = band_table(surfaces)
    alias_bands = band_table(alias_for_bands).select(
        F.col("key_id").alias("alias_id"), "band", "band_hash"
    )
    return (
        surf_bands.join(F.broadcast(alias_bands), ["band", "band_hash"])
        .select("key_id", "alias_id")
        .dropDuplicates(["key_id", "alias_id"])
    )


def link_surfaces(
    surfaces: DataFrame,
    kb_index: dict,
    min_score: float = 0.5,
    exact_bonus: float = 0.25,
    type_bonus: float = 0.05,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """surfaces: (key_id, surface, entity_type, n_mentions) →
    (key_id, surface, kb_id, link_score) — best KB link per surface.

    Candidates: LSH band join surface↔alias (blocked, broadcast KB), or a
    precomputed (key_id, alias_id) table. Score: TF-IDF cosine (IDF from
    the KB corpus) + exact-match bonus + type-agreement bonus; winner per
    surface by (score desc, kb_id).
    """
    cands = candidates if candidates is not None else link_candidates(surfaces, kb_index)

    # surface-side TF-IDF postings with the KB's IDF table
    tf = _gram_postings(surfaces, "key_id", "surface")
    w = tf.join(F.broadcast(kb_index["idf"]), "gram").select(
        "key", "gram", ((1.0 + F.log("tf")) * F.col("idf")).alias("w")
    )
    norms = w.groupBy("key").agg(F.sqrt(F.sum(F.col("w") ** 2)).alias("norm"))
    surf_postings = w.join(norms, "key").select(
        F.col("key").alias("key_id"),
        "gram",
        (F.col("w") / F.col("norm")).alias("w_surf"),
    )

    dot = (
        cands.join(surf_postings, "key_id")
        .join(F.broadcast(kb_index["postings"]), ["alias_id", "gram"])
        .groupBy("key_id", "alias_id")
        .agg(F.sum(F.col("w_surf") * F.col("w_alias")).alias("cosine"))
    )
    scored = (
        dot.join(
            F.broadcast(
                kb_index["aliases"].select(
                    "alias_id", "alias", "kb_id", "description"
                )
            ),
            "alias_id",
        )
        .join(
            surfaces.select("key_id", "surface", "entity_type", "n_mentions"),
            "key_id",
        )
        .withColumn(
            "link_score",
            F.round(
                F.col("cosine")
                + F.when(F.lower("alias") == F.col("surface"), exact_bonus).otherwise(0.0)
                + F.when(
                    F.col("entity_type").isin("PER", "ORG", "LOC"), type_bonus
                ).otherwise(0.0),
                6,
            ),
        )
    )
    w_best = Window.partitionBy("key_id").orderBy(
        F.desc("link_score"), F.asc("kb_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .where((F.col("rn") == 1) & (F.col("link_score") >= min_score))
        .select("key_id", "surface", "entity_type", "kb_id", "description", "link_score")
    )


def demo_kb(spark: SparkSession) -> DataFrame:
    """The reference's 19-entry demo KB (utils.rs:555-625) as an alias
    table, with a few alias variants per entity."""
    from anno_spark.core.document import KNOWN_KB_ENTITIES

    rows = []
    for name, (qid, desc) in KNOWN_KB_ENTITIES.items():
        rows.append((name, qid, desc))
        parts = name.split()
        if len(parts) > 1:
            rows.append((parts[-1], qid, desc))  # surname / last-token alias
    return spark.createDataFrame(
        rows, "alias string, kb_id string, description string"
    ).dropDuplicates(["alias", "kb_id"])

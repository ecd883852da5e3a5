"""Corpus curation — the end-to-end training-data selection pass that
the individual dedup/quality/lang operators exist to feed. One call
decides, per document, whether it enters the training corpus and why
not otherwise:

    drop precedence (first match wins, deterministic):
      1. exact_dup   — not the min-doc_id holder of its normalized text
      2. near_dup    — not the min-doc_id member of its MinHash cluster
      3. lang        — language outside the allow-list
      4. low_quality — heuristic quality score below threshold

Keep-first (min doc_id) is the standard "keep the earliest copy"
policy; with doc_id assigned in crawl order it keeps the first crawl.

At 100 TB this is the same plan shape as its parts: one fingerprint
groupBy, the banded LSH + CC machinery (blocked, id-only shuffles),
JVM-codegen quality exprs, and broadcast-size winner tables joined
back. No new shuffle beyond what the parts already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .dedup import minhash_near_duplicates
from .textstats import normalized_fingerprint, quality_score

DEFAULT_LANGS = ("en", "de", "fr", "es")


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.67,
    langs: tuple = DEFAULT_LANGS,
    near_dup_threshold: float = 0.8,
    sigs: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, keep boolean, drop_reason string|null)."""
    base = docs.select("doc_id", F.col("lang"), F.col(text_col).alias("text"))

    # 1. exact duplicates: keep the min doc_id per normalized fingerprint
    w_fp = Window.partitionBy(normalized_fingerprint(F.col("text")))
    flags = base.withColumn(
        "is_exact_dup", F.col("doc_id") != F.min("doc_id").over(w_fp)
    )

    # 2. near-dup clusters: keep the min doc_id per MinHash/LSH cluster
    clusters = minhash_near_duplicates(
        docs, threshold=near_dup_threshold, text_col=text_col, sigs=sigs
    )
    w_cl = Window.partitionBy("cluster_id")
    losers = (
        clusters.withColumn("cluster_min", F.min("doc_id").over(w_cl))
        .where(F.col("doc_id") != F.col("cluster_min"))
        .select("doc_id", F.lit(True).alias("is_near_dup"))
    )
    flags = flags.join(losers, "doc_id", "left").withColumn(
        "is_near_dup", F.coalesce("is_near_dup", F.lit(False))
    )

    # 3/4. language + quality
    q = quality_score(docs, text_col).select("doc_id", "quality_score")
    flags = flags.join(q, "doc_id")

    reason = (
        F.when(F.col("is_exact_dup"), F.lit("exact_dup"))
        .when(F.col("is_near_dup"), F.lit("near_dup"))
        .when(~F.col("lang").isin(list(langs)), F.lit("lang"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
    )
    return flags.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )

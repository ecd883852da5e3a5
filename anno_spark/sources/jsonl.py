"""S3 — JSONL GroundedDocument import (SURVEY §2.1;
anno/src/cli/commands/crossdoc.rs:245-424).

The reference parses serde-JSON documents ({id, text, entities:[{text,
entity_type|label, start, end, confidence}]}) from files/globs/stdin
into its Corpus. Spark-native: `spark.read.json` with an explicit schema
(never schema inference at scale) producing the same `mentions` table
the extraction stage emits — pre-annotated corpora skip extraction and
enter the pipeline at the resolution stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GROUNDED_DOC_SCHEMA = (
    "id string, text string, "
    "entities array<struct<text string, entity_type string, label string, "
    "start bigint, `end` bigint, confidence double>>"
)


def read_grounded_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL docs → (url, text, entities) with the doc id as url."""
    raw = spark.read.schema(GROUNDED_DOC_SCHEMA).json(path)
    return raw.select(F.col("id").alias("url"), "text", "entities")


def mentions_from_grounded(docs: DataFrame) -> DataFrame:
    """→ the standard mentions table (entity_type falls back to the
    `label` field as in the reference's flexible parse,
    crossdoc.rs:300-340)."""
    m = docs.select(
        "url", F.posexplode("entities").alias("mention_idx", "e")
    ).select(
        "url",
        "mention_idx",
        F.col("e.text").alias("text"),
        F.coalesce(F.col("e.entity_type"), F.col("e.label"), F.lit("UNK")).alias(
            "entity_type"
        ),
        F.col("e.start").cast("int").alias("start"),
        F.col("e.end").cast("int").alias("end"),
        F.coalesce(F.col("e.confidence"), F.lit(1.0)).alias("confidence"),
        F.lit("import").alias("pattern"),
        F.lit("jsonl").alias("source"),
    )
    return m.withColumn(
        "mention_id", F.xxhash64("url", "start", "end", "entity_type")
    )

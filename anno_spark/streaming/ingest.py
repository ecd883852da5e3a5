"""Structured Streaming ingestion (SURVEY §2.10 "streaming" row).

The reference's only streaming concept is chunked extraction with offset
shift (anno/src/lib.rs:179-195); the Spark-native equivalent is a real
incremental pipeline:

* :func:`stream_pages_from_parquet` — file-source stream over a pages
  directory (new parquet files appear as the crawler lands batches).
* :func:`streaming_triples` — the SAME extraction transformation as the
  batch path (mapInPandas is streaming-safe: stateless per-row), so the
  batch/streaming code paths cannot drift.
* :func:`streaming_event_counts` — watermarked tumbling-window
  aggregation over the events table schema; late rows beyond the
  watermark are dropped by Spark's state store.

Tests drive these with `trigger(availableNow=True)` + memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract as ex

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_pages_from_parquet(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_triples(pages_stream: DataFrame) -> DataFrame:
    """Incremental pages → triples (identical transformation to batch)."""
    extracted = ex.extract_documents(pages_stream)
    return ex.triples_table(extracted)


def streaming_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).start.alias("hour_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory table <name>."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

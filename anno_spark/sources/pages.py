"""The `pages` input table (BASELINE.json input_hint):

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Two constructors:

* :func:`synthesize_pages` — distributed deterministic synthesis: every
  page is a pure function of ``doc_id`` (anno_spark.corpus), generated
  via ``spark.range(n) → mapInPandas``. No driver-side loop, no RNG
  state: the same corpus materializes identically at any parallelism,
  which is what makes the local[8]-vs-local[32] scaling comparison an
  apples-to-apples measurement.

* :func:`pages_from_documents` — derives the page set from the
  driver-generated ``documents`` parquet (doc_id drives the synthesis),
  so the driver's correctness harness exercises the same pipeline over
  its own testdata row set.

On a real deployment this table is an Iceberg table of Common-Crawl
pages; the reader is a plain `spark.read` so swapping
`format("iceberg").load("db.pages")` in changes nothing downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the worker so --py-files shipping works unchanged
    from anno_spark.corpus import generate_pages_pandas

    for pdf in batches:
        if len(pdf) == 0:
            continue
        yield generate_pages_pandas(pdf["id"].tolist())


def synthesize_pages(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic Common-Crawl-style corpus of ``n`` pages."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    ids = spark.range(0, n, 1, numPartitions=min(partitions, max(1, n)))
    return ids.mapInPandas(_gen_batches, schema=PAGES_SCHEMA)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose doc_ids come from the testdata ``documents`` table.

    The doc_id list is repartitioned to full parallelism before the
    generation UDF — a small parquet arrives as one split, and without
    this every downstream pandas UDF would run on a single core.
    """
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    par = max(spark.sparkContext.defaultParallelism, 8)
    ids = docs.select(F.col("doc_id").alias("id")).repartition(par)
    return ids.mapInPandas(_gen_batches, schema=PAGES_SCHEMA)

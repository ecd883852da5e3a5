"""URL / domain analysis over the pages table — the per-domain corpus
profile every Common-Crawl-style pipeline needs (crawl-budget and
quality decisions are made per registered domain, not per page).

All pure JVM expressions: ``parse_url`` for host/path (Catalyst
built-in), array ops for the label arithmetic. The DuckDB oracle
re-derives host/path with regexps — an independent derivation of the
same contract, not a transcription.

Registered-domain note: the real public-suffix list is data, not logic
(co.uk, com.au, ...); this engine uses the documented last-two-labels
heuristic. Swapping in a PSL broadcast join changes nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _host(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def _domain(host: Column) -> Column:
    parts = F.split(host, r"\.")
    return F.when(
        F.size(parts) >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def url_parts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """→ (url, host, domain, tld, path_depth): per-URL structural parse.

    ``domain`` = last two host labels (documented heuristic, see module
    docstring); ``path_depth`` = number of non-empty path segments.
    """
    url = F.col(url_col)
    host = _host(url)
    parts = F.split(host, r"\.")
    path = F.parse_url(url, F.lit("PATH"))
    depth = F.size(F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != F.lit("")))
    return pages.select(
        url.alias("url"),
        host.alias("host"),
        _domain(host).alias("domain"),
        F.element_at(parts, -1).alias("tld"),
        depth.alias("path_depth"),
    )


def domain_profile(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """→ per-registered-domain crawl profile: page count, distinct
    hosts, language spread, mean path depth, first/last crawl time.

    One groupBy on domain (the shuffle key a crawl pipeline would
    bucket its lake tables by); at 10¹² pages this is the same shape
    as any hot-key aggregation — partial aggregation map-side, AQE
    skew split for megadomains.
    """
    cols = [F.col(url_col).alias("url")]
    has_ts = "warc_ts" in pages.columns
    has_lang = "lang" in pages.columns
    if has_ts:
        cols.append(F.col("warc_ts"))
    if has_lang:
        cols.append(F.col("lang"))
    parsed = pages.select(*cols)
    url = F.col("url")
    host = _host(url)
    path = F.parse_url(url, F.lit("PATH"))
    depth = F.size(F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != F.lit("")))
    parsed = parsed.withColumn("host", host).withColumn(
        "domain", _domain(F.col("host"))
    ).withColumn("path_depth", depth)
    aggs = [
        F.count("*").alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
        F.round(F.avg("path_depth"), 6).alias("avg_path_depth"),
    ]
    if has_lang:
        aggs.append(F.countDistinct("lang").alias("n_langs"))
    if has_ts:
        aggs.append(F.min("warc_ts").alias("first_crawl"))
        aggs.append(F.max("warc_ts").alias("last_crawl"))
    return parsed.groupBy("domain").agg(*aggs)

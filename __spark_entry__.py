"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship KG-construction run (pages → triples) on
sf0.001. `queries()` — one entry per implemented operator family
(SURVEY.md §2 + the training-data ops). `oracle_sql()` — DuckDB
equivalents for every SQL-expressible query; KG-pipeline queries whose
semantics are non-SQL (NER/coref/CDCR UDF payloads) are rows-only
checked, but their correctness is pinned by the pytest parity suite
(tests/test_spark_pipeline.py) against the pure-Python oracle.

Column-name discipline: every computed column is aliased identically in
the Spark code and the SQL string.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG extraction over Common-Crawl-style pages derived
    from the sf0.001 documents table → (subj, pred, obj) triples."""
    from anno_spark.operators import extract as ex
    from anno_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, SF0001)
    extracted = ex.extract_documents(pages)
    return ex.triples_table(extracted)


# ===========================================================================
# KG pipeline queries (pages synthesized deterministically from doc_ids)
# ===========================================================================


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anno_spark.sources.pages import pages_from_documents

    return pages_from_documents(spark, sf_dir)


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anno_spark.operators import extract as ex

    return ex.extract_documents(_pages(spark, sf_dir))


def q_kg_mentions(spark, sf_dir):
    from anno_spark.operators import extract as ex

    return ex.mentions_table(_extracted(spark, sf_dir))


def q_kg_triples(spark, sf_dir):
    from anno_spark.operators import extract as ex

    return ex.triples_table(_extracted(spark, sf_dir))


def q_kg_tracks(spark, sf_dir):
    from anno_spark.operators import extract as ex

    return ex.tracks_table(_extracted(spark, sf_dir))


def q_kg_identities(spark, sf_dir):
    from anno_spark.operators import extract as ex
    from anno_spark.operators import resolve as rx

    mentions = ex.mentions_table(_extracted(spark, sf_dir))
    _, idents, _ = rx.resolve_mentions(mentions)
    return idents


def q_kg_nodes(spark, sf_dir):
    from anno_spark.operators import extract as ex
    from anno_spark.operators import graph as g
    from anno_spark.operators import resolve as rx

    mentions = ex.mentions_table(_extracted(spark, sf_dir))
    _, idents, _ = rx.resolve_mentions(mentions)
    return g.nodes_table(idents)


def q_kg_edges(spark, sf_dir):
    from anno_spark.operators import extract as ex
    from anno_spark.operators import graph as g
    from anno_spark.operators import resolve as rx

    extracted = _extracted(spark, sf_dir)
    mentions = ex.mentions_table(extracted)
    triples = ex.triples_table(extracted)
    keyed, idents, _ = rx.resolve_mentions(mentions)
    nodes = g.nodes_table(idents)
    keyed_surfaces = keyed.select(
        "surface", "entity_type", F.col("component_id").alias("identity_id")
    )
    return g.edges_table(triples, keyed_surfaces, nodes)


def q_kg_extraction_metrics(spark, sf_dir):
    from anno_spark.operators import extract as ex

    return ex.extraction_metrics(_extracted(spark, sf_dir))


def q_kg_events(spark, sf_dir):
    from anno_spark.operators.events import events_table

    return events_table(_pages(spark, sf_dir))


def q_kg_cooccurrence(spark, sf_dir):
    from anno_spark.operators import extract as ex
    from anno_spark.operators.graph import cooccurrence_edges

    mentions = ex.mentions_table(_extracted(spark, sf_dir))
    return cooccurrence_edges(mentions, max_distance=100)


def q_kg_communities(spark, sf_dir):
    from anno_spark.operators import extract as ex
    from anno_spark.operators import graph as g
    from anno_spark.operators import resolve as rx
    from anno_spark.operators.communities import label_propagation

    extracted = _extracted(spark, sf_dir)
    mentions = ex.mentions_table(extracted)
    triples = ex.triples_table(extracted)
    keyed, idents, _ = rx.resolve_mentions(mentions)
    nodes = g.nodes_table(idents)
    edges = g.edges_table(
        triples,
        keyed.selectExpr("surface", "entity_type", "component_id as identity_id"),
        nodes,
    )
    return label_propagation(nodes.select("node_id"), edges)


def q_kg_entity_links(spark, sf_dir):
    from anno_spark.operators import extract as ex
    from anno_spark.operators import linking
    from anno_spark.operators import resolve as rx

    mentions = ex.mentions_table(_extracted(spark, sf_dir))
    keys = rx.surface_keys(mentions)
    idx = linking.build_kb_index(spark, linking.demo_kb(spark))
    return linking.link_surfaces(keys, idx)


# ===========================================================================
# Oracle-checked NER pattern queries (probe text derived identically in SQL)
# ===========================================================================

# Spark + DuckDB build the SAME probe column from documents:
_PROBE_SQL = (
    "concat('Contact bob', cast(doc_id % 97 as varchar), '@example.com on 2024-01-', "
    "lpad(cast(doc_id % 27 + 1 as varchar), 2, '0'), ' about ', "
    "cast(doc_id % 100 as varchar), '% of the $', cast(doc_id % 500 as varchar), "
    "' budget. ', text)"
)


def _probe_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("Contact bob"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("@example.com on 2024-01-"),
            F.lpad((F.col("doc_id") % 27 + 1).cast("string"), 2, "0"),
            F.lit(" about "),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("% of the $"),
            (F.col("doc_id") % 500).cast("string"),
            F.lit(" budget. "),
            F.col("text"),
        ).alias("probe_text"),
    )


def _pattern_query(name):
    def q(spark, sf_dir):
        from anno_spark.functions import pattern_matches

        return pattern_matches(_probe_df(spark, sf_dir), name)

    return q


def _pattern_oracle(pattern: str) -> str:
    pat = pattern.replace("'", "''")
    return (
        f"WITH probe AS (SELECT doc_id, {_PROBE_SQL} AS probe_text FROM documents) "
        f"SELECT doc_id, unnest(regexp_extract_all(probe_text, '{pat}')) AS mention "
        f"FROM probe"
    )


# ===========================================================================
# Dedup / text-stats queries over documents
# ===========================================================================


def q_dedup_exact(spark, sf_dir):
    from anno_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf_dir, "documents")).select(
        "fingerprint", "n_docs", "first_doc"
    )


def q_doc_stats(spark, sf_dir):
    from anno_spark.operators.textstats import doc_stats

    return doc_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars", "n_tokens", "n_lines", "alpha_ratio", "digit_ratio", "fingerprint"
    )


def q_lang_profile(spark, sf_dir):
    from anno_spark.operators.textstats import token_count

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.length("text").alias("nc"), token_count(F.col("text")).alias("nt"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").alias("total_chars"),
            F.round(F.avg("nt"), 6).alias("avg_tokens"),
        )
    )


def q_doc_quality(spark, sf_dir):
    from anno_spark.operators.textstats import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_lang_detect(spark, sf_dir):
    from anno_spark.operators.textstats import detect_languages

    return detect_languages(_t(spark, sf_dir, "documents"))


def q_dedup_minhash(spark, sf_dir):
    from anno_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(_t(spark, sf_dir, "documents"), threshold=0.8)


def q_dedup_simhash(spark, sf_dir):
    from anno_spark.operators.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_dedup_ngram_jaccard(spark, sf_dir):
    from anno_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


# ===========================================================================
# Similarity search over embeddings
# ===========================================================================


def q_ann_cosine_topk(spark, sf_dir):
    from anno_spark.operators.simsearch import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), k=5)


def q_ann_ivf_topk(spark, sf_dir):
    from anno_spark.operators.simsearch import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), k=5)


ANN_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
s AS (SELECT query_id, vec_id AS neighbor_id,
        list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS csim
      FROM q, e WHERE vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, rank, round(csim, 4) AS sim FROM r WHERE rank <= 5
"""


# ===========================================================================
# Multimodal plumbing (self-synthesized media table; rows-only check)
# ===========================================================================


def q_media_profile(spark, sf_dir):
    from anno_spark.operators.multimodal import extract_features, media_profile, synthesize_media

    return media_profile(extract_features(synthesize_media(spark, 300)))


# ===========================================================================
# Relational layer (SURVEY §2.10 checklist over the TPC-H-ish tables)
# ===========================================================================


def q_rel_agg_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(20,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_rel_join_topcustomers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(20,2)")).cast("double").alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


def q_rel_broadcast_region_sales(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dims = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", F.col("r_name").alias("region_name")
        )
    )
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(dims, c["c_nationkey"] == dims["n_nationkey"])
        .groupBy("region_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,2)")).cast("double").alias("revenue"),
        )
    )


def q_rel_window_latest_order(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = o.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return latest.groupBy("o_orderpriority").agg(F.count("*").alias("n_customers"))


def q_rel_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


def q_rel_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


def q_events_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(20,2)")).cast("double"), 2).alias("total_value"),
        )
    )


# ===========================================================================
# registry
# ===========================================================================


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # KG pipeline (pinned by pytest parity vs the pure-Python oracle)
        "kg_mentions": q_kg_mentions,
        "kg_triples": q_kg_triples,
        "kg_tracks": q_kg_tracks,
        "kg_identities": q_kg_identities,
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "kg_extraction_metrics": q_kg_extraction_metrics,
        "kg_cooccurrence": q_kg_cooccurrence,
        "kg_events": q_kg_events,
        "kg_entity_links": q_kg_entity_links,
        "kg_communities": q_kg_communities,
        # NER pattern extraction (oracled per-pattern)
        "ner_emails": _pattern_query("EMAIL"),
        "ner_iso_dates": _pattern_query("DATE_ISO"),
        "ner_percent": _pattern_query("PERCENT"),
        "ner_money": _pattern_query("MONEY_SYMBOL"),
        # dedup / text analysis
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "doc_stats": q_doc_stats,
        "doc_quality": q_doc_quality,
        "lang_profile": q_lang_profile,
        "lang_detect": q_lang_detect,
        # similarity search
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        # multimodal plumbing
        "media_profile": q_media_profile,
        # relational layer (SURVEY §2.10)
        "rel_agg_lineitem": q_rel_agg_lineitem,
        "rel_join_topcustomers": q_rel_join_topcustomers,
        "rel_broadcast_region_sales": q_rel_broadcast_region_sales,
        "rel_window_latest_order": q_rel_window_latest_order,
        "rel_anti_join": q_rel_anti_join,
        "rel_distinct": q_rel_distinct,
        "events_hourly": q_events_hourly,
    }
    return q


def oracle_sql() -> dict[str, str]:
    from anno_spark.functions.patterns import ORACLE_SAFE_PATTERNS

    return {
        "ner_emails": _pattern_oracle(ORACLE_SAFE_PATTERNS["EMAIL"]),
        "ner_iso_dates": _pattern_oracle(ORACLE_SAFE_PATTERNS["DATE_ISO"]),
        "ner_percent": _pattern_oracle(ORACLE_SAFE_PATTERNS["PERCENT"]),
        "ner_money": _pattern_oracle(ORACLE_SAFE_PATTERNS["MONEY_SYMBOL"]),
        "dedup_exact": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
                   count(*) AS n_docs, min(doc_id) AS first_doc
            FROM documents GROUP BY 1
        """,
        "doc_stats": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) END AS n_tokens,
                   length(string_split(text, chr(10))) AS n_lines,
                   round(CASE WHEN length(text) = 0 THEN 0.0
                        ELSE (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) * 1.0 / length(text) END, 6) AS alpha_ratio,
                   round(CASE WHEN length(text) = 0 THEN 0.0
                        ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / length(text) END, 6) AS digit_ratio,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "lang_profile": """
            WITH t AS (
              SELECT lang, length(text) AS nc,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE length(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) END AS nt
              FROM documents)
            SELECT lang, count(*) AS n_docs, sum(nc) AS total_chars, round(avg(nt), 6) AS avg_tokens
            FROM t GROUP BY lang
        """,
        "ann_cosine_topk": ANN_ORACLE,
        "rel_agg_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(cast(l_quantity AS decimal(20,2))) AS double) AS sum_qty,
                   cast(sum(cast(l_extendedprice AS decimal(20,2))) AS double) AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= date '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "rel_join_topcustomers": """
            SELECT c_custkey, c_name,
                   cast(sum(cast(o_totalprice AS decimal(20,2))) AS double) AS total_spent
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY total_spent DESC, c_custkey ASC LIMIT 10
        """,
        "rel_broadcast_region_sales": """
            SELECT r_name AS region_name, count(*) AS n_orders,
                   cast(sum(cast(o_totalprice AS decimal(20,2))) AS double) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "rel_window_latest_order": """
            WITH latest AS (
              SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
            SELECT o_orderpriority, count(*) AS n_customers FROM latest WHERE rn = 1
            GROUP BY o_orderpriority
        """,
        "rel_anti_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "rel_distinct": "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour_start, event_type,
                   count(*) AS n_events,
                   round(cast(sum(cast(value AS decimal(20,2))) AS double), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
    }

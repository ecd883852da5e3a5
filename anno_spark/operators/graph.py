"""G1–G3/G5 — knowledge-graph materialization (SURVEY §2.7).

nodes: one row per canonical identity, id per the reference priority
rule kb_id > coref_<id> > "{type}:{name}" (graph.rs:677-691), with
mention counts (graph.rs:227-290).

edges: triples joined to the node table on BOTH endpoints — the inner
join enforces the reference's both-nodes-exist rule (graph.rs:292-312).
Each endpoint join keys on the (surface, entity_type) pair, hitting the
same distinct-surface table the resolver built, so edge construction is
two hash joins on a pre-aggregated (small) dimension — broadcast when it
fits (typical: distinct surfaces ≪ triples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_id_expr(kb_id, identity_id, entity_type, name):
    """graph.rs:677-691 priority: kb_id > coref_<id> > type:name."""
    return (
        F.when(kb_id.isNotNull(), kb_id)
        .when(identity_id.isNotNull(), F.concat(F.lit("coref_"), identity_id.cast("string")))
        .otherwise(
            F.concat(
                F.lower(entity_type),
                F.lit(":"),
                F.replace(F.lower(name), F.lit(" "), F.lit("_")),
            )
        )
    )


def nodes_table(identities: DataFrame) -> DataFrame:
    """identities → nodes(node_id, name, node_type, n_mentions, n_docs,
    n_surfaces, aliases, kb_id[, first_seen, valid_from, valid_until]).

    Temporal properties (graph.rs:249-290): when the resolver carried a
    timestamp, nodes get ``first_seen`` (earliest observation) and the
    validity interval ``valid_from = first_seen`` / ``valid_until = null``
    (open-ended, graph.rs:264-283)."""
    cols = [
        node_id_expr(
            F.col("kb_id"),
            F.col("identity_id"),
            F.col("entity_type"),
            F.col("canonical_name"),
        ).alias("node_id"),
        F.col("identity_id"),
        F.col("canonical_name").alias("name"),
        F.col("entity_type").alias("node_type"),
        F.col("n_mentions"),
        F.col("n_docs"),
        F.col("n_surfaces"),
        F.col("aliases"),
        F.col("kb_id"),
    ]
    if "first_seen" in identities.columns:
        cols += [
            F.col("first_seen"),
            F.col("first_seen").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_until"),
        ]
    return identities.select(*cols)


def edges_table(triples: DataFrame, keyed_surfaces: DataFrame, nodes: DataFrame) -> DataFrame:
    """triples + surface→identity map + nodes → edges(src_node, dst_node,
    relation, confidence, n_occurrences).

    keyed_surfaces: (surface, entity_type, identity_id) from the resolver.
    The dimension is broadcast if small (Catalyst AQE decides; explicit
    hint applied since distinct surfaces ≪ triples at web scale only
    after heavy-hitter pruning — here always small enough).
    """
    surf = F.broadcast(
        keyed_surfaces.select("surface", "entity_type", "identity_id")
    )
    node_ids = F.broadcast(nodes.select("identity_id", "node_id"))

    t = triples.select(
        F.lower("subj_text").alias("subj_surface"),
        F.col("subj_type"),
        F.lower("obj_text").alias("obj_surface"),
        F.col("obj_type"),
        "pred",
        "confidence",
    )
    s = t.join(
        surf.withColumnRenamed("surface", "subj_surface")
        .withColumnRenamed("entity_type", "subj_type")
        .withColumnRenamed("identity_id", "subj_identity"),
        ["subj_surface", "subj_type"],
    )
    so = s.join(
        surf.withColumnRenamed("surface", "obj_surface")
        .withColumnRenamed("entity_type", "obj_type")
        .withColumnRenamed("identity_id", "obj_identity"),
        ["obj_surface", "obj_type"],
    )
    resolved = (
        so.join(
            node_ids.withColumnRenamed("identity_id", "subj_identity")
            .withColumnRenamed("node_id", "src_node"),
            "subj_identity",
        )
        .join(
            node_ids.withColumnRenamed("identity_id", "obj_identity")
            .withColumnRenamed("node_id", "dst_node"),
            "obj_identity",
        )
    )
    return (
        resolved.groupBy("src_node", "dst_node", F.col("pred").alias("relation"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.max("confidence").alias("confidence"),
        )
    )


def cooccurrence_edges(mentions: DataFrame, max_distance: int = 100) -> DataFrame:
    """R3 — co-occurrence fallback edges (graph.rs:320-382): every entity
    pair within ``max_distance`` chars in the same doc → RELATED_TO edge
    with the pair distance; no self-pairs.

    Relational form: a url-equi self-join with a range predicate — the
    shuffle key is the doc, so the join stays doc-local (each url's
    mentions co-locate in one partition; the quadratic term is bounded by
    mentions-per-doc, which extraction already caps at 512).
    """
    m = mentions.select("url", "mention_idx", "text", "entity_type", "start", "end")
    a = m.select(
        "url",
        F.col("mention_idx").alias("idx_a"),
        F.col("text").alias("text_a"),
        F.col("entity_type").alias("type_a"),
        F.col("start").alias("start_a"),
        F.col("end").alias("end_a"),
    )
    b = m.select(
        "url",
        F.col("mention_idx").alias("idx_b"),
        F.col("text").alias("text_b"),
        F.col("entity_type").alias("type_b"),
        F.col("start").alias("start_b"),
        F.col("end").alias("end_b"),
    )
    # span gap; 0 when spans overlap (relations.py cooccurrence_edges,
    # mirroring graph.rs:320-382)
    dist = (
        F.when(F.col("start_b") >= F.col("end_a"), F.col("start_b") - F.col("end_a"))
        .when(F.col("start_a") >= F.col("end_b"), F.col("start_a") - F.col("end_b"))
        .otherwise(F.lit(0))
    )
    return (
        a.join(b, "url")
        .where((F.col("idx_a") < F.col("idx_b")) & (dist <= max_distance))
        .select(
            "url",
            "text_a",
            "type_a",
            "text_b",
            "type_b",
            F.lit("RELATED_TO").alias("relation"),
            dist.alias("distance"),
        )
    )

"""S5 — graph export renderers (SURVEY §2.1).

Mirrors the reference's GraphDocument exports: Cypher MERGE statements
(anno-core/src/graph.rs:386-421), NetworkX node-link JSON
(graph.rs:434-497), and JSON-LD (graph.rs:501-573). These are driver-side
renders intended for small filtered subgraphs (the reference renders a
whole in-memory GraphDocument; at lake scale you filter/limit first —
the functions accept DataFrames and a row cap to make the collect
explicit and bounded).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

DEFAULT_CAP = 100_000


def _collect(df: DataFrame, cap: int):
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"export exceeds cap={cap} rows; filter the graph first"
        )
    return rows


def _cypher_escape(s: str) -> str:
    return str(s).replace("\\", "\\\\").replace("'", "\\'")


def _cypher_identifier(s: str, fallback: str) -> str:
    """Node labels / relationship types interpolate as bare identifiers —
    sanitize to [A-Za-z0-9_] (ADVICE r01: '-', '.', backticks would emit
    invalid or injectable Cypher) and never start with a digit."""
    import re

    ident = re.sub(r"[^A-Za-z0-9_]", "_", str(s or fallback)) or fallback
    return ("_" + ident) if ident[0].isdigit() else ident


def to_cypher(nodes: DataFrame, edges: DataFrame, cap: int = DEFAULT_CAP) -> str:
    """MERGE-based Cypher script (graph.rs:386-421 shape)."""
    lines = []
    for n in _collect(nodes, cap):
        label = _cypher_identifier(n["node_type"], "Entity")
        lines.append(
            f"MERGE (n:{label} {{id: '{_cypher_escape(n['node_id'])}'}}) "
            f"SET n.name = '{_cypher_escape(n['name'])}', "
            f"n.mentions_count = {int(n['n_mentions'])};"
        )
    for e in _collect(edges, cap):
        rel = _cypher_identifier(str(e["relation"]).upper(), "RELATED_TO")
        lines.append(
            f"MATCH (a {{id: '{_cypher_escape(e['src_node'])}'}}), "
            f"(b {{id: '{_cypher_escape(e['dst_node'])}'}}) "
            f"MERGE (a)-[r:{rel}]->(b) SET r.confidence = {float(e['confidence'])};"
        )
    return "\n".join(lines)


def cypher_statements(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """DISTRIBUTED Cypher render — one MERGE/MATCH statement per row,
    every string built by JVM expressions (escape, identifier sanitize,
    interpolation). This is the at-scale export path: a 10⁹-node graph
    writes its Cypher as a text table (``df.write.text``) instead of
    collecting through the driver like :func:`to_cypher` (which stays as
    the bounded small-subgraph convenience). Statement text is
    line-for-line identical to the driver-side renderer (pytest-pinned).
    """
    from pyspark.sql import functions as F

    def esc(c):
        return F.replace(
            F.replace(c.cast("string"), F.lit("\\"), F.lit("\\\\")),
            F.lit("'"),
            F.lit("\\'"),
        )

    def ident(c, fallback):
        base = F.coalesce(c.cast("string"), F.lit(fallback))
        base = F.when(base == "", F.lit(fallback)).otherwise(base)
        sanitized = F.regexp_replace(base, "[^A-Za-z0-9_]", "_")
        sanitized = F.when(sanitized == "", F.lit(fallback)).otherwise(sanitized)
        return F.when(
            F.substring(sanitized, 1, 1).rlike("[0-9]"),
            F.concat(F.lit("_"), sanitized),
        ).otherwise(sanitized)

    node_stmts = nodes.select(
        F.concat(
            F.lit("MERGE (n:"), ident(F.col("node_type"), "Entity"),
            F.lit(" {id: '"), esc(F.col("node_id")),
            F.lit("'}) SET n.name = '"), esc(F.col("name")),
            F.lit("', n.mentions_count = "),
            F.col("n_mentions").cast("long").cast("string"),
            F.lit(";"),
        ).alias("stmt")
    )
    edge_stmts = edges.select(
        F.concat(
            F.lit("MATCH (a {id: '"), esc(F.col("src_node")),
            F.lit("'}), (b {id: '"), esc(F.col("dst_node")),
            F.lit("'}) MERGE (a)-[r:"),
            ident(F.upper(F.col("relation")), "RELATED_TO"),
            F.lit("]->(b) SET r.confidence = "),
            F.col("confidence").cast("double").cast("string"),
            F.lit(";"),
        ).alias("stmt")
    )
    return node_stmts.unionByName(edge_stmts)


def to_networkx_json(nodes: DataFrame, edges: DataFrame, cap: int = DEFAULT_CAP) -> str:
    """NetworkX node-link JSON (graph.rs:434-497 shape)."""
    payload = {
        "directed": True,
        "multigraph": False,
        "graph": {},
        "nodes": [
            {
                "id": n["node_id"],
                "name": n["name"],
                "node_type": n["node_type"],
                "mentions_count": int(n["n_mentions"]),
            }
            for n in _collect(nodes, cap)
        ],
        "links": [
            {
                "source": e["src_node"],
                "target": e["dst_node"],
                "relation": e["relation"],
                "confidence": float(e["confidence"]),
            }
            for e in _collect(edges, cap)
        ],
    }
    return json.dumps(payload, sort_keys=True)


def to_jsonld(nodes: DataFrame, edges: DataFrame, cap: int = DEFAULT_CAP) -> str:
    """JSON-LD graph document (graph.rs:501-573 shape)."""
    graph = [
        {
            "@id": f"entity:{n['node_id']}",
            "@type": n["node_type"],
            "name": n["name"],
            "mentionsCount": int(n["n_mentions"]),
        }
        for n in _collect(nodes, cap)
    ]
    for e in _collect(edges, cap):
        graph.append(
            {
                "@id": f"relation:{e['src_node']}:{e['relation']}:{e['dst_node']}",
                "@type": "Relation",
                "subject": f"entity:{e['src_node']}",
                "predicate": e["relation"],
                "object": f"entity:{e['dst_node']}",
                "confidence": float(e["confidence"]),
            }
        )
    doc = {
        "@context": {
            "name": "http://schema.org/name",
            "entity": "http://example.org/entity/",
            "relation": "http://example.org/relation/",
        },
        "@graph": graph,
    }
    return json.dumps(doc, sort_keys=True)


def to_graphml(nodes: DataFrame, edges: DataFrame, cap: int = DEFAULT_CAP) -> str:
    """GraphML (the standard XML graph-interchange format — Gephi,
    yEd, igraph, NetworkX all read it). Same bounded-collect contract
    as the other renderers; proper XML escaping via ElementTree."""
    import xml.etree.ElementTree as ET

    root = ET.Element("graphml", xmlns="http://graphml.graphdrawing.org/xmlns")
    for kid, name, typ, target in (
        ("d0", "name", "string", "node"),
        ("d1", "node_type", "string", "node"),
        ("d2", "n_mentions", "long", "node"),
        ("d3", "relation", "string", "edge"),
        ("d4", "confidence", "double", "edge"),
    ):
        ET.SubElement(
            root, "key",
            id=kid, **{"for": target, "attr.name": name, "attr.type": typ},
        )
    g = ET.SubElement(root, "graph", id="kg", edgedefault="directed")
    for n in _collect(nodes, cap):
        el = ET.SubElement(g, "node", id=str(n["node_id"]))
        for kid, val in (
            ("d0", n["name"]),
            ("d1", n["node_type"]),
            ("d2", int(n["n_mentions"])),
        ):
            d = ET.SubElement(el, "data", key=kid)
            d.text = str(val)
    for i, e in enumerate(_collect(edges, cap)):
        el = ET.SubElement(
            g, "edge",
            id=f"e{i}", source=str(e["src_node"]), target=str(e["dst_node"]),
        )
        for kid, val in (("d3", e["relation"]), ("d4", float(e["confidence"]))):
            d = ET.SubElement(el, "data", key=kid)
            d.text = str(val)
    return ET.tostring(root, encoding="unicode", xml_declaration=True)

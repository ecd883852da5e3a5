"""Tests for the eval (E2 strict P/R), streaming, exports, and linking
modules."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from anno_spark.eval import relation_prf
from anno_spark.operators import extract as ex
from anno_spark.sources.pages import synthesize_pages

TRIPLE_DDL = (
    "url string, subj_start int, subj_end int, obj_start int, obj_end int, pred string"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_DDL)


class TestRelationEval:
    def test_perfect_match(self, spark):
        g = _mk(spark, [("u1", 0, 5, 10, 15, "CEO_OF"), ("u2", 1, 2, 3, 4, "WORKS_FOR")])
        prf = relation_prf(g, g)
        assert prf.precision == prf.recall == prf.f1 == 1.0

    def test_case_insensitive_pred(self, spark):
        g = _mk(spark, [("u1", 0, 5, 10, 15, "CEO_OF")])
        p = _mk(spark, [("u1", 0, 5, 10, 15, "ceo_of")])
        assert relation_prf(p, g).f1 == 1.0

    def test_span_mismatch_fails_strict(self, spark):
        g = _mk(spark, [("u1", 0, 5, 10, 15, "CEO_OF")])
        p = _mk(spark, [("u1", 0, 6, 10, 15, "CEO_OF")])  # off-by-one head
        prf = relation_prf(p, g)
        assert prf.precision == 0.0 and prf.recall == 0.0

    def test_greedy_one_to_one(self, spark):
        # two identical predictions, one gold: only one matches
        g = _mk(spark, [("u1", 0, 5, 10, 15, "X")])
        p = _mk(spark, [("u1", 0, 5, 10, 15, "X"), ("u1", 0, 5, 10, 15, "X")])
        prf = relation_prf(p, g)
        assert prf.n_matched == 1 and prf.precision == 0.5 and prf.recall == 1.0

    def test_pipeline_pr_gate_on_held_out(self, spark):
        """The ≥0.95 gate (BASELINE.json): Spark pipeline triples vs the
        pure-Python oracle on the held-out split — must be exactly 1.0."""
        from anno_spark.core.document import extract_document
        from anno_spark import corpus

        n = 120
        pages = synthesize_pages(spark, n)
        pred = ex.triples_table(ex.extract_documents(pages)).where(
            F.xxhash64("url") % 5 == 0  # any deterministic subset works
        )
        gold_rows = []
        for i in range(n):
            rec = corpus.page_record(i)
            for t in extract_document(rec["text"]).triples:
                gold_rows.append(
                    (rec["url"], t.subj_start, t.subj_end, t.obj_start, t.obj_end, t.pred)
                )
        gold = spark.createDataFrame(gold_rows, TRIPLE_DDL).where(
            F.xxhash64("url") % 5 == 0
        )
        prf = relation_prf(pred, gold)
        assert prf.n_gold > 0
        assert prf.precision == 1.0 and prf.recall == 1.0


class TestStreaming:
    def test_streaming_triples_match_batch(self, spark, tmp_path):
        from anno_spark.streaming import ingest

        pages = synthesize_pages(spark, 40)
        src = str(tmp_path / "pages_stream")
        pages.repartition(4).write.parquet(src)

        stream = ingest.stream_pages_from_parquet(spark, src, max_files_per_trigger=2)
        triples_stream = ingest.streaming_triples(stream)
        ingest.run_to_memory_sink(triples_stream, "t_stream")
        got = {
            (r["url"], r["subj_start"], r["pred"], r["obj_start"])
            for r in spark.sql("select * from t_stream").collect()
        }
        want = {
            (r["url"], r["subj_start"], r["pred"], r["obj_start"])
            for r in ex.triples_table(ex.extract_documents(pages)).collect()
        }
        assert got == want and len(got) > 0

    def test_streaming_event_counts(self, spark, sf_dir, tmp_path):
        from anno_spark.streaming import ingest

        events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        src = str(tmp_path / "events_stream")
        events.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(ingest.EVENTS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = ingest.streaming_event_counts(stream)
        ingest.run_to_memory_sink(agg, "e_counts", output_mode="complete")
        got = {
            (r["hour_start"], r["event_type"]): r["n_events"]
            for r in spark.sql("select * from e_counts").collect()
        }
        want = {
            (r["hour_start"], r["event_type"]): r["n_events"]
            for r in events.groupBy(
                F.window("ts", "1 hour").start.alias("hour_start"), "event_type"
            )
            .agg(F.count("*").alias("n_events"))
            .collect()
        }
        assert got == want


class TestExports:
    @pytest.fixture(scope="class")
    def graph(self, spark):
        from anno_spark.operators import graph as g
        from anno_spark.operators import resolve as rx

        extracted = ex.extract_documents(synthesize_pages(spark, 60))
        mentions = ex.mentions_table(extracted)
        triples = ex.triples_table(extracted)
        keyed, idents, _ = rx.resolve_mentions(mentions)
        nodes = g.nodes_table(idents)
        edges = g.edges_table(
            triples,
            keyed.selectExpr("surface", "entity_type", "component_id as identity_id"),
            nodes,
        )
        return nodes.localCheckpoint(), edges.localCheckpoint()

    def test_cypher(self, graph):
        from anno_spark.operators.exports import to_cypher

        nodes, edges = graph
        script = to_cypher(nodes, edges)
        assert script.count("MERGE (n:") == nodes.count()
        assert "SET r.confidence" in script

    def test_cypher_distributed_matches_driver_render(self, graph, spark):
        """cypher_statements (JVM string building, scale path) emits the
        exact statement multiset of the driver-side to_cypher — incl. on
        adversarial names needing escaping/sanitization."""
        from pyspark.sql import functions as F

        from anno_spark.operators.exports import cypher_statements, to_cypher

        nodes, edges = graph
        dist = sorted(r["stmt"] for r in cypher_statements(nodes, edges).collect())
        drv = sorted(to_cypher(nodes, edges).splitlines())
        assert dist == drv

        # adversarial: quotes + backslash in names, dirty labels/relations
        bad_nodes = spark.createDataFrame(
            [
                ("id'1\\x", "O'Brien \\ Sons", "9weird-type", 3),
                ("id2", "plain", None, 1),
            ],
            "node_id string, name string, node_type string, n_mentions long",
        )
        bad_edges = spark.createDataFrame(
            [("id'1\\x", "id2", "related-to!", 0.7)],
            "src_node string, dst_node string, relation string, confidence double",
        )
        dist = sorted(r["stmt"] for r in cypher_statements(bad_nodes, bad_edges).collect())
        drv = sorted(to_cypher(bad_nodes, bad_edges).splitlines())
        assert dist == drv
        assert any("\\'" in s for s in dist)  # escaping actually exercised
        assert any(":_9weird_type" in s for s in dist)

    def test_networkx_json(self, graph):
        from anno_spark.operators.exports import to_networkx_json

        nodes, edges = graph
        payload = json.loads(to_networkx_json(nodes, edges))
        assert len(payload["nodes"]) == nodes.count()
        assert len(payload["links"]) == edges.count()
        node_ids = {n["id"] for n in payload["nodes"]}
        assert all(l["source"] in node_ids for l in payload["links"])

    def test_jsonld(self, graph):
        from anno_spark.operators.exports import to_jsonld

        nodes, edges = graph
        doc = json.loads(to_jsonld(nodes, edges))
        assert "@context" in doc
        assert len(doc["@graph"]) == nodes.count() + edges.count()

    def test_cap_enforced(self, graph):
        from anno_spark.operators.exports import to_cypher

        nodes, edges = graph
        with pytest.raises(ValueError):
            to_cypher(nodes, edges, cap=1)


class TestLinking:
    def test_links_known_entities(self, spark):
        from anno_spark.operators import linking

        kb = linking.demo_kb(spark)
        idx = linking.build_kb_index(spark, kb)
        surfaces = spark.createDataFrame(
            [
                ("marie curie", "PER", 10),
                ("curie", "PER", 3),
                ("apple", "ORG", 20),
                ("completely unrelated xyz", "ORG", 1),
            ],
            "surface string, entity_type string, n_mentions bigint",
        ).withColumn("key_id", F.xxhash64("surface", "entity_type"))
        links = linking.link_surfaces(surfaces, idx).collect()
        by_surface = {r["surface"]: r for r in links}
        assert by_surface["marie curie"]["kb_id"] == "Q7186"
        assert by_surface["apple"]["kb_id"] == "Q312"
        assert "completely unrelated xyz" not in by_surface

    def test_tfidf_prefers_exact_alias(self, spark):
        from anno_spark.operators import linking

        kb = linking.demo_kb(spark)
        idx = linking.build_kb_index(spark, kb)
        surfaces = spark.createDataFrame(
            [("berlin", "LOC", 5)],
            "surface string, entity_type string, n_mentions bigint",
        ).withColumn("key_id", F.xxhash64("surface", "entity_type"))
        links = linking.link_surfaces(surfaces, idx).collect()
        assert len(links) == 1 and links[0]["kb_id"] == "Q64"


class TestStatefulStreaming:
    """applyInPandasWithState: incremental surface-key aggregation whose
    running totals must equal the batch surface_keys over the union of
    all micro-batches (streaming/stateful.py docstring contract)."""

    MENTIONS_DDL = (
        "url string, text string, entity_type string, warc_ts timestamp"
    )

    def _mentions(self, spark):
        rows = [
            ("u1", "Alice Smith", "PER", "2024-01-03 00:00:00"),
            ("u1", "Acme Corp", "ORG", "2024-01-03 00:00:00"),
            ("u2", "alice smith", "PER", "2024-01-01 00:00:00"),
            ("u3", "ALICE SMITH", "PER", "2024-01-05 00:00:00"),
            ("u3", "Berlin", "LOC", "2024-01-05 00:00:00"),
            ("u4", "Acme Corp", "ORG", "2024-01-02 00:00:00"),
        ]
        return spark.createDataFrame(
            [(u, t, e, __import__("datetime").datetime.fromisoformat(ts)) for u, t, e, ts in rows],
            self.MENTIONS_DDL,
        )

    def test_running_totals_match_batch(self, spark, tmp_path):
        from anno_spark.streaming import ingest
        from anno_spark.streaming.stateful import streaming_surface_keys

        mentions = self._mentions(spark)
        src = str(tmp_path / "mentions_stream")
        # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
        mentions.repartition(3).write.parquet(src)

        stream = (
            spark.readStream.schema(self.MENTIONS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_surface_keys(stream)
        ingest.run_to_memory_sink(out, "surf_state", output_mode="update")
        rows = spark.sql("select * from surf_state").collect()

        # latest emitted row per key (n_mentions is monotone)
        latest = {}
        for r in rows:
            k = (r["surface"], r["entity_type"])
            if k not in latest or r["n_mentions"] > latest[k]["n_mentions"]:
                latest[k] = r

        want = {
            (r["surface"], r["entity_type"]): r
            for r in mentions.groupBy(
                F.lower("text").alias("surface"), "entity_type"
            )
            .agg(
                F.count("*").alias("n_mentions"),
                F.min("warc_ts").alias("first_seen"),
            )
            .collect()
        }
        assert set(latest) == set(want)
        for k, w in want.items():
            assert latest[k]["n_mentions"] == w["n_mentions"], k
            assert latest[k]["first_seen"] == w["first_seen"], k

    def test_state_accumulates_across_batches(self, spark, tmp_path):
        """A key split across micro-batches must emit increasing running
        totals (proves cross-batch state, not per-batch aggregation)."""
        from anno_spark.streaming import ingest
        from anno_spark.streaming.stateful import streaming_surface_keys

        import datetime as dt

        src = str(tmp_path / "mentions_stream2")
        one = spark.createDataFrame(
            [("u1", "Alice", "PER", dt.datetime(2024, 1, 2))], self.MENTIONS_DDL
        )
        two = spark.createDataFrame(
            [("u2", "alice", "PER", dt.datetime(2024, 1, 1))], self.MENTIONS_DDL
        )
        one.coalesce(1).write.parquet(src)
        two.coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(self.MENTIONS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ingest.run_to_memory_sink(
            streaming_surface_keys(stream), "surf_state2", output_mode="update"
        )
        rows = sorted(
            spark.sql("select * from surf_state2").collect(),
            key=lambda r: r["n_mentions"],
        )
        assert [r["n_mentions"] for r in rows] == [1, 2]
        assert [r["n_new"] for r in rows] == [1, 1]
        # first_seen tightened when the earlier-dated batch arrived
        assert rows[-1]["first_seen"] == dt.datetime(2024, 1, 1)


class TestStreamingSnapshotSink:
    """Exactly-once streaming ingestion into the snapshot lake: batches
    commit once, replays are skipped, and a resumed stream with the same
    checkpoint appends only unseen source batches."""

    def test_stream_lands_and_resumes(self, spark, tmp_path):
        from anno_spark.plans.snapshots import SnapshotStore
        from anno_spark.streaming import ingest
        from anno_spark.streaming.sink import (
            StreamingSnapshotSink,
            load_stream_stage,
            run_stream_to_snapshots,
        )

        src = str(tmp_path / "pages_src")
        ckpt = str(tmp_path / "ckpt")
        store = SnapshotStore(str(tmp_path / "lake"))
        pages = synthesize_pages(spark, 30)
        pages.repartition(3).write.parquet(src)

        stream = ingest.stream_pages_from_parquet(spark, src, max_files_per_trigger=1)
        run_stream_to_snapshots(
            ingest.streaming_triples(stream), store, "triples_stream", ckpt
        )
        got = load_stream_stage(spark, store, "triples_stream")
        want = ex.triples_table(ex.extract_documents(pages))
        key = lambda r: (r["url"], r["subj_start"], r["pred"], r["obj_start"])
        assert {key(r) for r in got.collect()} == {key(r) for r in want.collect()}
        meta = store.committed("triples_stream")
        assert meta["streaming"] and meta["last_batch_id"] >= 1
        assert meta["rows"] == want.count()

        # replayed batch (same id, different data) must be a no-op
        sink = StreamingSnapshotSink(store, "triples_stream")
        sink(spark.range(5).selectExpr("id AS url"), meta["last_batch_id"])
        assert store.committed("triples_stream")["rows"] == want.count()

        # resume with the same checkpoint: nothing new -> nothing appended
        stream2 = ingest.stream_pages_from_parquet(spark, src, max_files_per_trigger=1)
        run_stream_to_snapshots(
            ingest.streaming_triples(stream2), store, "triples_stream", ckpt
        )
        assert store.committed("triples_stream")["rows"] == want.count()

        # land more source files; resume appends ONLY the new batch
        more = synthesize_pages(spark, 40).where("url NOT IN (SELECT url FROM parquet.`" + src + "`)")
        more.coalesce(1).write.mode("append").parquet(src)
        stream3 = ingest.stream_pages_from_parquet(spark, src, max_files_per_trigger=1)
        run_stream_to_snapshots(
            ingest.streaming_triples(stream3), store, "triples_stream", ckpt
        )
        want_all = ex.triples_table(ex.extract_documents(spark.read.parquet(src)))
        got_all = load_stream_stage(spark, store, "triples_stream")
        assert {key(r) for r in got_all.collect()} == {key(r) for r in want_all.collect()}


class TestGraphML:
    def test_roundtrips_through_elementtree(self, spark):
        import xml.etree.ElementTree as ET

        from anno_spark.operators.exports import to_graphml

        nodes = spark.createDataFrame(
            [("Q1", "Alice <&> Smith", "PER", 3), ("coref_5", "Acme", "ORG", 2)],
            "node_id string, name string, node_type string, n_mentions bigint",
        )
        edges = spark.createDataFrame(
            [("Q1", "coref_5", "WORKS_FOR", 0.7)],
            "src_node string, dst_node string, relation string, confidence double",
        )
        xml = to_graphml(nodes, edges)
        root = ET.fromstring(xml)
        ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
        got_nodes = root.findall(".//g:node", ns)
        got_edges = root.findall(".//g:edge", ns)
        assert len(got_nodes) == 2 and len(got_edges) == 1
        names = {d.text for d in root.findall(".//g:node/g:data[@key='d0']", ns)}
        assert "Alice <&> Smith" in names  # XML escaping round-trips
        e = got_edges[0]
        assert e.get("source") == "Q1" and e.get("target") == "coref_5"

    def test_cap_enforced(self, spark):
        import pytest as _pytest

        from anno_spark.operators.exports import to_graphml

        nodes = spark.range(5).selectExpr(
            "cast(id as string) node_id", "'n' name", "'PER' node_type", "id n_mentions"
        )
        edges = spark.createDataFrame(
            [], "src_node string, dst_node string, relation string, confidence double"
        )
        with _pytest.raises(ValueError):
            to_graphml(nodes, edges, cap=3)

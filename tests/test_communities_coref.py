"""Tests for L1/L2 label-propagation communities and C4 union-find coref."""

from __future__ import annotations

from anno_spark.core.coref_unionfind import resolve_coreferences_unionfind
from anno_spark.core.entity import Mention


def _m(text, etype, start):
    return Mention(text, etype, start, start + len(text), 0.8, "t", "test")


class TestCorefUnionFind:
    def test_string_match_clusters(self):
        ms = [
            _m("Marie Curie", "PER", 0),
            _m("Curie", "PER", 40),
            _m("Apple", "ORG", 80),
        ]
        out = resolve_coreferences_unionfind(ms)
        assert len(out) == 1
        assert out[0].members == [0, 1]
        assert out[0].canonical_name == "Marie Curie"

    def test_type_mismatch_blocks(self):
        ms = [_m("Washington", "PER", 0), _m("Washington", "LOC", 40)]
        assert resolve_coreferences_unionfind(ms) == []

    def test_embedding_path(self):
        ms = [_m("the company", "ORG", 0), _m("that firm", "ORG", 30)]
        emb = [[1.0, 0.0], [0.99, 0.14]]
        out = resolve_coreferences_unionfind(ms, embeddings=emb)
        assert len(out) == 1 and out[0].members == [0, 1]

    def test_distance_gate(self):
        ms = [_m("the company", "ORG", 0), _m("that firm", "ORG", 900)]
        emb = [[1.0, 0.0], [1.0, 0.0]]
        assert resolve_coreferences_unionfind(ms, embeddings=emb) == []

    def test_representative_last_longest(self):
        ms = [_m("Acme", "ORG", 0), _m("ACME", "ORG", 20)]
        out = resolve_coreferences_unionfind(ms)
        assert out[0].representative == 1  # tie → last (Rust max_by_key)


class TestLabelPropagation:
    def test_two_cliques(self, spark):
        from anno_spark.operators.communities import label_propagation

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
            "src_node string, dst_node string",
        )
        nodes = spark.createDataFrame(
            [(v,) for v in "abcxyz"], "node_id string"
        )
        comm = {r["node_id"]: r["community_id"] for r in label_propagation(nodes, edges).collect()}
        assert comm["a"] == comm["b"] == comm["c"]
        assert comm["x"] == comm["y"] == comm["z"]

    def test_hierarchy_runs(self, spark):
        from anno_spark.operators.communities import hierarchical_communities

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y"), ("c", "x")],
            "src_node string, dst_node string",
        )
        nodes = spark.createDataFrame([(v,) for v in "abcxy"], "node_id string")
        out = hierarchical_communities(nodes, edges, levels=2)
        assert out.count() == 5
        assert "level_0" in out.columns

    def test_single_edge_converges_to_one_community(self, spark):
        # ADVICE r01 regression: a—b used to oscillate (label swap every
        # round) and land on two singletons by iteration-count parity
        from anno_spark.operators.communities import label_propagation

        edges = spark.createDataFrame([("a", "b")], "src_node string, dst_node string")
        nodes = spark.createDataFrame([("a",), ("b",)], "node_id string")
        comm = {r["node_id"]: r["community_id"] for r in label_propagation(nodes, edges).collect()}
        assert comm["a"] == comm["b"]

    def test_path_middle_joins_a_neighbor(self, spark):
        # ADVICE r01 regression: on a—b—c, b used to end up in a
        # community containing neither of its only neighbors
        from anno_spark.operators.communities import label_propagation

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src_node string, dst_node string"
        )
        nodes = spark.createDataFrame([(v,) for v in "abc"], "node_id string")
        comm = {r["node_id"]: r["community_id"] for r in label_propagation(nodes, edges).collect()}
        assert comm["b"] in (comm["a"], comm["c"])


class TestLeiden:
    """L1 — modularity local moving (strata/src/leiden.rs:58-160 port)."""

    def _graph(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
            "src_node string, dst_node string",
        )
        nodes = spark.createDataFrame([(v,) for v in "abcxyz"], "node_id string")
        return nodes, edges

    def test_recovers_planted_communities(self, spark):
        from anno_spark.operators.communities import leiden_communities

        nodes, edges = self._graph(spark)
        comm = {r["node_id"]: r["community_id"] for r in leiden_communities(nodes, edges).collect()}
        assert comm["a"] == comm["b"] == comm["c"]
        assert comm["x"] == comm["y"] == comm["z"]
        assert comm["a"] != comm["x"]

    def test_single_edge_merges(self, spark):
        # ΔQ of merging two singletons = 1 − γ/2 > 0 at γ=1 ⇒ one community
        from anno_spark.operators.communities import leiden_communities

        edges = spark.createDataFrame([("a", "b")], "src_node string, dst_node string")
        nodes = spark.createDataFrame([("a",), ("b",)], "node_id string")
        comm = {r["node_id"]: r["community_id"] for r in leiden_communities(nodes, edges).collect()}
        assert comm["a"] == comm["b"]

    def test_improves_reference_modularity(self, spark):
        # the partition found must beat all-singletons under the
        # reference's edge-sum modularity (leiden.rs:169-283)
        from anno_spark.operators.communities import leiden_communities, modularity

        nodes, edges = self._graph(spark)
        found = leiden_communities(nodes, edges)
        singletons = nodes.selectExpr("node_id", "node_id as community_id")
        assert modularity(found, edges) > modularity(singletons, edges)

    def test_resolution_monotone(self, spark):
        # higher γ ⇒ at least as many, smaller communities (lib.rs:52-57)
        from anno_spark.operators.communities import leiden_communities

        nodes, edges = self._graph(spark)
        low = leiden_communities(nodes, edges, resolution=0.5)
        high = leiden_communities(nodes, edges, resolution=4.0)
        n_low = low.select("community_id").distinct().count()
        n_high = high.select("community_id").distinct().count()
        assert n_high >= n_low

    def test_deterministic(self, spark):
        from anno_spark.operators.communities import leiden_communities

        nodes, edges = self._graph(spark)
        a = sorted(map(tuple, leiden_communities(nodes, edges).collect()))
        b = sorted(map(tuple, leiden_communities(nodes, edges).collect()))
        assert a == b

    def test_matches_sequential_reference_port(self, spark):
        # partition-level parity with the leiden.rs greedy (pure-Python
        # port, strata/src/leiden.rs:58-160) on planted-structure graphs
        from anno_spark.core.leiden_ref import leiden_ref, partition_sets
        from anno_spark.operators.communities import leiden_communities

        cases = [
            # two triangles + bridge
            [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
            # single edge
            [("a", "b")],
            # 4-clique + pendant
            [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e")],
        ]
        for elist in cases:
            vs = sorted({v for e in elist for v in e})
            ref = leiden_ref(vs, [(a, b, 1.0) for a, b in elist])
            nodes = spark.createDataFrame([(v,) for v in vs], "node_id string")
            edges = spark.createDataFrame(elist, "src_node string, dst_node string")
            got = {r["node_id"]: r["community_id"]
                   for r in leiden_communities(nodes, edges).collect()}
            assert partition_sets(got) == partition_sets(ref), (elist, got, ref)


class TestLeidenRefPort:
    """Pure-python checks of the leiden.rs port itself (no Spark)."""

    def test_modularity_formula(self):
        # hand value: triangle in one community, γ=1: m=3, all deg=2,
        # q = 3·(1 − 2·2/6) = 1, Q = 1/6
        from anno_spark.core.leiden_ref import modularity_ref

        edges = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0)]
        comm = {"a": 0, "b": 0, "c": 0}
        assert abs(modularity_ref(["a", "b", "c"], edges, comm) - 1.0 / 6.0) < 1e-12

    def test_merges_single_edge(self):
        from anno_spark.core.leiden_ref import leiden_ref

        out = leiden_ref(["a", "b"], [("a", "b", 1.0)])
        assert out["a"] == out["b"]

    def test_resolution_splits(self):
        # very high γ penalizes merges: expected-term γ·k_a·k_b/2m wins
        from anno_spark.core.leiden_ref import leiden_ref

        edges = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0)]
        merged = leiden_ref(["a", "b", "c"], edges, resolution=1.0)
        split = leiden_ref(["a", "b", "c"], edges, resolution=10.0)
        assert len(set(merged.values())) < len(set(split.values()))

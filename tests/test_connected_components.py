"""Differential tests for connected_components: the driver union-find
fast path (≤ DRIVER_CC_MAX_EDGES) and the distributed min-label loop
must produce identical (key_id, component_id) sets on the same graph,
and component_id must equal the min reachable key either way."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from anno_spark.operators.resolve import connected_components


def _cc_reference(n_nodes, edges):
    """Pure-Python BFS reference: min reachable node per component."""
    adj = {i: set() for i in range(n_nodes)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    comp = {}
    for start in range(n_nodes):
        if start in comp:
            continue
        seen, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        label = min(seen)
        for x in seen:
            comp[x] = label
    return {(k, v) for k, v in comp.items()}


def _spark_cc(spark, n_nodes, edges, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "key_id bigint")
    if edges:
        edf = spark.createDataFrame(edges, "key_a bigint, key_b bigint")
    else:
        edf = spark.createDataFrame([], "key_a bigint, key_b bigint")
    out = connected_components(nodes, edf, **kw)
    return {(r["key_id"], r["component_id"]) for r in out.collect()}


class TestConnectedComponents:
    def _random_graph(self, seed, n=60, m=45):
        rng = random.Random(seed)
        edges = set()
        while len(edges) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        return n, sorted(edges)

    def test_driver_path_matches_reference(self, spark):
        n, edges = self._random_graph(7)
        want = _cc_reference(n, edges)
        assert _spark_cc(spark, n, edges) == want

    def test_distributed_path_matches_driver_path(self, spark):
        for seed in (1, 2, 3):
            n, edges = self._random_graph(seed)
            via_driver = _spark_cc(spark, n, edges)
            via_loop = _spark_cc(spark, n, edges, driver_max_edges=None)
            assert via_driver == via_loop == _cc_reference(n, edges), seed

    def test_distributed_path_long_chain(self, spark):
        # path graph: worst case for label propagation (diameter = n-1);
        # pointer jumping must converge within max_iterations
        n = 40
        edges = [(i, i + 1) for i in range(n - 1)]
        got = _spark_cc(spark, n, edges, driver_max_edges=None)
        assert got == {(i, 0) for i in range(n)}

    def test_empty_edges_all_singletons(self, spark):
        got = _spark_cc(spark, 5, [])
        assert got == {(i, i) for i in range(5)}

    def test_gate_boundary_forces_distributed(self, spark):
        # driver_max_edges=0 with nonzero edges must take the loop
        got = _spark_cc(spark, 4, [(0, 1), (2, 3)], driver_max_edges=0)
        assert got == {(0, 0), (1, 0), (2, 2), (3, 2)}

    def test_duplicate_edges_change_nothing_either_path(self, spark):
        """The symmetrized edge table is NOT deduped (in-repo producers
        emit distinct a<b pairs, so the exchange was waste); an outside
        caller passing duplicate or bidirectional edges must still get
        identical components on both paths — every consumer of the edge
        table is a min-aggregation."""
        n, edges = self._random_graph(11)
        noisy = edges + edges[::2] + [(b, a) for a, b in edges[1::2]]
        want = _cc_reference(n, edges)
        assert _spark_cc(spark, n, noisy) == want
        assert _spark_cc(spark, n, noisy, driver_max_edges=None) == want

    def test_distributed_path_has_no_edge_dedup_exchange(self, spark):
        """Plan gate: no hash exchange on (src, dst) pair identity —
        the only hash exchanges are the groupBy/join keys (key_id-
        or src-partitioned, node-proportional)."""
        import re

        nodes = spark.range(100).select(F.col("id").alias("key_id"))
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(99)], "key_a bigint, key_b bigint"
        )
        out = connected_components(nodes, edges, driver_max_edges=None)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for keys in re.findall(r"Exchange hashpartitioning\(([^)]+)\)", plan):
            cols = [c.strip().split("#")[0] for c in keys.split(",")[:-1]]
            assert len(cols) == 1, keys  # never (src, dst) pair identity

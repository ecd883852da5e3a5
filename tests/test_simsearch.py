"""ANN similarity search gates: IVF recall vs brute force, unbiased
deterministic centroid sampling (VERDICT r01 fix #7)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).localCheckpoint()


class TestIvf:
    def test_recall_at_5_vs_brute_force(self, spark, embeddings):
        from anno_spark.operators.simsearch import cosine_topk, ivf_topk

        exact = cosine_topk(embeddings, k=5).collect()
        approx = ivf_topk(embeddings, k=5).collect()
        truth: dict = {}
        for r in exact:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        got: dict = {}
        for r in approx:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ]
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.9, f"IVF recall@5 {recall:.3f} < 0.9"

    def test_centroid_sample_is_hash_ordered_not_prefix(self, spark, embeddings):
        # the bias fix: the training sample must NOT be the first-N by id
        from anno_spark.operators.simsearch import _SAMPLE_HASH_MOD, _SAMPLE_HASH_MULT

        ids = [r["vec_id"] for r in embeddings.select("vec_id").collect()]
        n = min(64, len(ids))
        by_hash = sorted(ids, key=lambda i: ((i * _SAMPLE_HASH_MULT) % _SAMPLE_HASH_MOD, i))[:n]
        assert set(by_hash) != set(sorted(ids)[:n])

    def test_local_centroids_match_spark(self, spark, embeddings, sf_dir):
        # the DuckDB oracle rebuilds centroids Spark-free — must be identical
        import os

        from anno_spark.operators.simsearch import train_centroids, train_centroids_local

        c_spark = train_centroids(embeddings, n_centroids=8, sample_n=256)
        c_local = train_centroids_local(
            os.path.join(sf_dir, "embeddings.parquet"), n_centroids=8, sample_n=256
        )
        assert np.allclose(c_spark, c_local, atol=0.0)


class TestScaleFlags:
    """VERDICT r02 wrong #3: the two ANN scale traps are now gated."""

    def test_cosine_topk_refuses_large_data(self, spark):
        from pyspark.sql import functions as F

        from anno_spark.operators.simsearch import cosine_topk

        big = spark.range(0, 2_000, 1, 4).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(0.1), F.lit(0.2)).alias("embedding"),
        )
        with pytest.raises(ValueError, match="brute-force baseline"):
            cosine_topk(big, k=1, max_brute_rows=1_000)
        # explicit opt-out still works (oracle/benchmark use)
        assert cosine_topk(
            big.limit(50), k=1, query_filter="vec_id % 10 = 0",
            max_brute_rows=None,
        ).count() > 0

    def test_ivf_large_query_table_plans_non_broadcast(self, spark):
        """A 10^5-row query table must NOT get the broadcast hint — the
        probe join falls back to a plain (AQE-managed) equi-join on
        centroid_id; a small query set keeps the hint."""
        from pyspark.sql import functions as F

        from anno_spark.operators.simsearch import ivf_topk

        # dim-64 vectors: the exploded query row costs nprobe × ~560 B, so
        # 10^5 queries exceed the broadcast budget (dim matters — the gate
        # is byte-based, not row-based)
        emb = spark.range(0, 100_000, 1, 8).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.col("id") * (3 + 2 * m) % 97).cast("float") / 97.0 - 0.5)
                    for m in range(64)
                ]
            ).alias("embedding"),
        )
        # plan-only inspection: the candidate join is never executed
        big = ivf_topk(emb, k=1, query_filter="true")
        plan_big = big._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" not in plan_big.lower()

        small = ivf_topk(emb, k=1, query_filter="vec_id % 10000 = 0")
        plan_small = small._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" in plan_small.lower()

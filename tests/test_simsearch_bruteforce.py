"""r06 differential: the vectorized mapInPandas brute-force top-k must be
BIT-IDENTICAL to the old broadcast-cross Catalyst-expression plan — the
numpy kernel accumulates in dimension order precisely so that not a
single sim value (pre- or post-round) can move. Covers the real
embeddings table plus adversarial cases the kernel must get right:
exact ties (duplicate vectors → vec_id ASC tie-break), a zero vector
(0/0 → NaN, which Spark's descending sort ranks FIRST), and negative
components."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _old_expression_topk(embeddings, k, query_filter, vec_col="embedding"):
    """The r05 plan, verbatim: broadcast-cross join + HOF cosine."""
    from anno_spark.operators.simsearch import _as_double, cosine_sim_expr
    from anno_spark.plans.sizing import checkpoint_count

    e = embeddings.select("vec_id", _as_double(F.col(vec_col)).alias("v"))
    e, _ = checkpoint_count(e)
    q = e.where(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    j = F.broadcast(q).crossJoin(e).where(F.col("vec_id") != F.col("query_id"))
    j = j.withColumn("sim", cosine_sim_expr(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("sim", 4).alias("sim"),
        )
    )


def _assert_identical(new_df, old_df):
    new = sorted(tuple(r) for r in new_df.collect())
    old = sorted(tuple(r) for r in old_df.collect())
    # NaN != NaN under tuple equality — compare with repr, which is stable
    assert [repr(t) for t in new] == [repr(t) for t in old]


class TestBruteForceDifferential:
    def test_matches_expression_plan_on_real_embeddings(self, spark, sf_dir):
        from anno_spark.operators.simsearch import cosine_topk

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        _assert_identical(
            cosine_topk(emb, k=5),
            _old_expression_topk(emb, k=5, query_filter="vec_id % 100 = 0"),
        )

    def test_ties_zero_vector_and_negatives(self, spark):
        from anno_spark.operators.simsearch import cosine_topk

        rows = [
            (0, [1.0, 2.0, -3.0, 0.5]),
            (1, [1.0, 2.0, -3.0, 0.5]),   # duplicate of 0 → exact tie
            (2, [-1.0, -2.0, 3.0, -0.5]), # antipodal (sim = -1)
            (4, [2.0, 4.0, -6.0, 1.0]),   # colinear with 0 (sim = 1)
            (5, [0.1, -0.2, 0.3, 0.4]),
            (6, [1e-30, 2e-30, -3e-30, 5e-31]),  # denormal-ish scale
            (10, [3.0, 1.0, 4.0, 1.0]),
            (20, [-5.0, 9.0, -2.0, 6.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        for qf in ("vec_id % 10 = 0", "vec_id >= 0"):
            _assert_identical(
                cosine_topk(emb, k=3, query_filter=qf, vec_col="embedding"),
                _old_expression_topk(emb, k=3, query_filter=qf, vec_col="embedding"),
            )

    def test_partial_topk_is_lossless_across_partitions(self, spark):
        # many partitions, few rows each: per-batch top-k must still
        # yield the exact global top-k after the final window
        from pyspark.sql import functions as SF

        from anno_spark.operators.simsearch import cosine_topk

        emb = spark.range(0, 400, 1, 16).select(
            SF.col("id").alias("vec_id"),
            SF.array(
                (SF.col("id") % 17).cast("double"),
                (SF.col("id") % 5 - 2).cast("double"),
                SF.lit(1.0),
            ).alias("embedding"),
        )
        _assert_identical(
            cosine_topk(emb, k=7, query_filter="vec_id % 50 = 0"),
            _old_expression_topk(emb, k=7, query_filter="vec_id % 50 = 0"),
        )

    def test_zero_vector_raises_like_ansi_divide_by_zero(self, spark):
        # Spark 4 runs ANSI mode: the old expression plan raised
        # DIVIDE_BY_ZERO on a zero-norm vector; the kernel must not
        # silently emit NaN rows instead
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import CapturedException

        from anno_spark.operators.simsearch import cosine_topk

        emb = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [3.0, 4.0])],
            "vec_id bigint, embedding array<double>",
        )
        with pytest.raises((Py4JJavaError, CapturedException, Exception), match="DIVIDE_BY_ZERO"):
            cosine_topk(emb, k=2, query_filter="vec_id = 0").collect()

    def test_empty_query_set(self, spark):
        from anno_spark.operators.simsearch import cosine_topk

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id bigint, embedding array<double>",
        )
        out = cosine_topk(emb, k=2, query_filter="vec_id > 100")
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "rank", "sim"]

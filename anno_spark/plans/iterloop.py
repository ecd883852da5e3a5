"""Checkpoint helper for iterative DataFrame loops.

``DataFrame.localCheckpoint`` truncates lineage but PRESERVES the
pre-checkpoint plan statistics on the resulting LogicalRDD (so broadcast
decisions survive). In an iterative loop that is catastrophic: round N's
join-stats are a *product* over children that already carry round N-1's
product, so the BigInt ``sizeInBytes`` grows exponentially in digit count
and Catalyst's SizeInBytesOnlyStatsPlanVisitor ends up spending the
whole driver round in BigInteger.multiply (observed: leiden rounds going
0.5s → 5.7s → 50s on a 65-node graph; jstack pinned the time in
BigInteger.multiplyToomCook3 under visitJoin).

:func:`iter_checkpoint` materializes the checkpoint and then rebuilds
the DataFrame on the checkpointed row RDD with FRESH default stats, so
per-round cost stays flat no matter how many rounds run. The rebuild
uses ``internalCreateDataFrame`` (``private[sql]``, which the JVM
exposes publicly) — guarded by a fallback to the plain checkpoint if the
internal call ever disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint + stats reset, for loop-carried DataFrames."""
    ck = df.localCheckpoint()  # eager: materializes + truncates lineage
    spark = df.sparkSession
    try:
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(jnew, ck.sparkSession)
    except Exception:
        # Spark Connect or API change: fall back to the raw checkpoint
        # (correct, but loops beyond ~6 rounds pay the stats blowup)
        return ck

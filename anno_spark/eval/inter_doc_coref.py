"""Inter-document coreference (CDCR) clustering metrics (reference:
anno/src/eval/inter_doc_coref.rs:1-299).

Cluster purity / completeness between predicted identities and gold
clusters of track refs, complementing the B³/MUC/CEAF family in
eval/coref_metrics and eval/cluster_eval:

* purity: for each predicted identity, the fraction of its tracks in
  its majority gold cluster, track-weighted — which reduces to
  Σ max-gold-count / num_total (inter_doc_coref.rs:77-105);
* completeness: the symmetric quantity over gold clusters
  (inter_doc_coref.rs:107-130);
* ``num_total`` is the UNION of track refs seen on either side —
  tracks only in pred (or only in gold) inflate the denominator
  without contributing to any majority count
  (inter_doc_coref.rs:63-70);
* num_correct = Σ per-identity majority counts = the purity numerator.

Distributed shape: both sides are (doc_id, track_id, cluster) tables —
the engine's identities output (operators/resolve.py X5) is exactly
the predicted side. One inner join on the track ref, two
groupBy→max→sum rollups, one distinct-union count. Runs at any
cluster-table size; no driver-side maps.

Input note: the reference's ``num_pred_identities`` counts Identity
OBJECTS (inter_doc_coref.rs:146), including ones whose source is not
CrossDocCoref and which therefore contribute no tracks; the port's
input is already the (track, identity) mapping, so it counts DISTINCT
identity ids present in the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRACK = ["doc_id", "track_id"]


def inter_doc_coref_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """InterDocCorefMetrics::compute (inter_doc_coref.rs:38-152) as ONE
    row: cluster_purity, cluster_completeness, f1, num_pred_identities,
    num_gold_identities, num_correct, num_total.

    ``pred``: (doc_id, track_id, identity_id); ``gold``: (doc_id,
    track_id, cluster_id). Duplicate (doc_id, track_id) rows within a
    side are collapsed (the reference's HashMap insert keeps one
    mapping per track ref).
    """
    p = pred.select(*_TRACK, "identity_id").distinct()
    g = gold.select(*_TRACK, "cluster_id").distinct()

    joint = p.join(g, _TRACK).groupBy("identity_id", "cluster_id").agg(
        F.count("*").alias("n")
    )
    purity_sum = joint.groupBy("identity_id").agg(F.max("n").alias("m")).agg(
        F.coalesce(F.sum("m"), F.lit(0)).alias("num_correct")
    )
    completeness_sum = joint.groupBy("cluster_id").agg(F.max("n").alias("m")).agg(
        F.coalesce(F.sum("m"), F.lit(0)).alias("_comp_sum")
    )
    totals = (
        p.select(*_TRACK)
        .unionByName(g.select(*_TRACK))
        .distinct()
        .agg(F.count("*").alias("num_total"))
    )
    counts = p.agg(F.countDistinct("identity_id").alias("num_pred_identities")).crossJoin(
        g.agg(F.countDistinct("cluster_id").alias("num_gold_identities"))
    )

    purity = F.when(
        F.col("num_total") > 0, F.col("num_correct") / F.col("num_total")
    ).otherwise(0.0)
    completeness = F.when(
        F.col("num_total") > 0, F.col("_comp_sum") / F.col("num_total")
    ).otherwise(0.0)
    return (
        purity_sum.crossJoin(completeness_sum)
        .crossJoin(totals)
        .crossJoin(counts)
        .select(
            purity.alias("cluster_purity"),
            completeness.alias("cluster_completeness"),
            F.when(
                purity + completeness > 0,
                2.0 * purity * completeness / (purity + completeness),
            )
            .otherwise(0.0)
            .alias("f1"),
            "num_pred_identities",
            "num_gold_identities",
            "num_correct",
            "num_total",
        )
    )

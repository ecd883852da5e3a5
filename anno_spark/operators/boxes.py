"""Distributed box-embedding scoring: blocked pairs, coref clusters,
conflict detection.

Spark-first surface for :mod:`anno_spark.core.boxes` (reference:
anno/src/backends/box_embeddings.rs; resolver
anno/src/eval/coref_resolver.rs:1096-1240).  The reference scores boxes
pairwise in a single-threaded loop; at corpus scale that is O(n²), so
this module re-architects candidate generation around grid blocking:

* Every box is exploded to the integer grid cells its extent spans in
  the first ``block_dims`` dimensions (``F.sequence`` over
  ``floor(min/cell)..floor(max/cell)`` — JVM-side, no Python).
* Two boxes with a positive coreference score overlap in EVERY
  dimension, hence in the blocked dimensions, hence share at least one
  cell — the candidate join on cell keys is lossless for any
  ``threshold > 0`` (the same blocked-before-pairwise shape as the
  engine's MinHash/SimHash/Hamming families, SURVEY §2.6).
* Exact scoring then runs as whole-stage-codegen array expressions
  (``zip_with`` + ``aggregate``); no pandas UDF in the hot path.

Cluster formation reuses :func:`anno_spark.operators.resolve.
connected_components` (the resolver's union-find, distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from anno_spark.operators.resolve import connected_components

__all__ = [
    "boxes_from_vectors",
    "with_box_score",
    "box_coref_pairs",
    "box_coref_clusters",
    "box_conflicts",
]


def _as_double_arr(col):
    return F.transform(col, lambda x: x.cast("double"))


def _volume(mins, maxs):
    """∏ max(max_i - min_i, 0) as a codegen expression
    (box_embeddings.rs:75-83)."""
    widths = F.zip_with(maxs, mins, lambda hi, lo: F.greatest(hi - lo, F.lit(0.0)))
    return F.aggregate(widths, F.lit(1.0), lambda acc, x: acc * x)


def _intersection_volume(a_min, a_max, b_min, b_max):
    """Per-dim overlap product (box_embeddings.rs:89-108)."""
    lo = F.zip_with(a_min, b_min, lambda x, y: F.greatest(x, y))
    hi = F.zip_with(a_max, b_max, lambda x, y: F.least(x, y))
    w = F.zip_with(hi, lo, lambda h, l: F.greatest(h - l, F.lit(0.0)))
    return F.aggregate(w, F.lit(1.0), lambda acc, x: acc * x)


def boxes_from_vectors(df: DataFrame, vec_col: str = "embedding",
                       radius: float = 0.1, dims: int | None = None,
                       ) -> DataFrame:
    """Point embeddings -> hypercube boxes (BoxEmbedding::from_vector,
    box_embeddings.rs:297-303), entirely in column expressions.

    ``dims`` optionally truncates the vector first (box dimensionality is
    independent of embedding width; the reference trains d=2..8 boxes).
    """
    v = _as_double_arr(F.col(vec_col))
    if dims is not None:
        v = F.slice(v, 1, dims)
    r = F.lit(float(radius))
    return df.withColumn("box_min", F.transform(v, lambda x: x - r)) \
             .withColumn("box_max", F.transform(v, lambda x: x + r))


def with_box_score(pairs: DataFrame,
                   a_min="a_min", a_max="a_max",
                   b_min="b_min", b_max="b_max") -> DataFrame:
    """Add vol_a/vol_b/inter_vol/p_a_b/p_b_a/box_score columns.

    Mirrors conditional_probability's zero-volume rule (rs:229-243): the
    probability is 0.0 when the conditioning box has zero volume.
    Pure JVM expressions — stays inside whole-stage codegen.
    """
    amn, amx = F.col(a_min), F.col(a_max)
    bmn, bmx = F.col(b_min), F.col(b_max)
    out = (
        pairs.withColumn("vol_a", _volume(amn, amx))
        .withColumn("vol_b", _volume(bmn, bmx))
        .withColumn("inter_vol", _intersection_volume(amn, amx, bmn, bmx))
        .withColumn(
            "p_a_b",
            F.when(F.col("vol_b") == 0.0, F.lit(0.0))
            .otherwise(F.col("inter_vol") / F.col("vol_b")),
        )
        .withColumn(
            "p_b_a",
            F.when(F.col("vol_a") == 0.0, F.lit(0.0))
            .otherwise(F.col("inter_vol") / F.col("vol_a")),
        )
        .withColumn("box_score", (F.col("p_a_b") + F.col("p_b_a")) / 2.0)
    )
    return out


def _cells(box_min, box_max, dim_idx: int, cell_size: float):
    """Integer cells spanned by the box in dimension ``dim_idx`` (1-based
    element access)."""
    lo = F.floor(F.element_at(box_min, dim_idx + 1) / F.lit(cell_size))
    hi = F.floor(F.element_at(box_max, dim_idx + 1) / F.lit(cell_size))
    return F.sequence(lo.cast("long"), hi.cast("long"))


def box_coref_pairs(boxes: DataFrame, id_col: str = "box_id",
                    threshold: float = 0.7, cell_size: float = 1.0,
                    block_dims: int = 1) -> DataFrame:
    """All pairs with coreference score >= threshold, via grid blocking.

    Lossless for ``threshold > 0``: a scoring pair overlaps in every
    dimension, so it shares a cell in each blocked dimension.  Cell keys
    combine the first ``block_dims`` dims; expansion per box is the
    product of cells spanned per dim — with ``cell_size`` at or above
    the typical box width that's 1-2 cells/dim.  Returns
    (id_a, id_b, box_score, p_a_b, p_b_a) with id_a < id_b.

    Sizing ``block_dims``: candidates grow as sum over cells of
    C(occupancy, 2), so pick enough dims that per-cell occupancy stays
    O(1).  One dim is fine for small corpora; at 10^5 boxes over ~80
    cell positions per axis, 1-D stripes already mean ~10^8 candidate
    pairs while 3-D cells keep it near the true-pair count
    (tests/test_boxes_scale.py pins this with planted-pair recall at
    100k boxes).
    """
    cell = _cells(F.col("box_min"), F.col("box_max"), 0, cell_size)
    for d in range(1, block_dims):
        nxt = _cells(F.col("box_min"), F.col("box_max"), d, cell_size)
        # cartesian of per-dim cell lists, folded into one string key
        cell = F.flatten(F.transform(
            cell, lambda c: F.transform(
                nxt, lambda n: F.concat_ws(":", c.cast("string"),
                                           n.cast("string")))))
    tagged = (
        boxes.select(F.col(id_col), "box_min", "box_max",
                     F.explode(cell).alias("cell"))
    )
    left = tagged.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col("box_min").alias("a_min"), F.col("box_max").alias("a_max"))
    right = tagged.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col("box_min").alias("b_min"), F.col("box_max").alias("b_max"))
    # a pair sharing k cells appears k times; emit ONCE, map-side, from
    # the pair's MINIMUM shared cell (the PBSM reference-point trick).
    # Per dim the shared cells form the contiguous range
    # [max(lo_a, lo_b), min(hi_a, hi_b)]; its low end needs only the two
    # mins — both already on the join row — so the dedup is a codegen'd
    # filter, not a pairs-proportional dropDuplicates exchange.
    def _canon(d: int):
        return F.greatest(
            F.floor(F.element_at(F.col("a_min"), d + 1) / F.lit(cell_size)),
            F.floor(F.element_at(F.col("b_min"), d + 1) / F.lit(cell_size)),
        ).cast("long")

    if block_dims == 1:
        canon = _canon(0)
    else:
        canon = F.concat_ws(
            ":", *[_canon(d).cast("string") for d in range(block_dims)]
        )
    cand = (
        left.join(right, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("cell") == canon)
    )
    return (
        with_box_score(cand)
        .where(F.col("box_score") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "box_score", "p_a_b", "p_b_a")
    )


def box_coref_clusters(boxes: DataFrame, id_col: str = "box_id",
                       threshold: float = 0.7, cell_size: float = 1.0,
                       type_col: str | None = None,
                       block_dims: int = 1) -> DataFrame:
    """(id, cluster_id) via transitive closure over above-threshold pairs.

    The distributed analogue of BoxCorefResolver's union-find
    (coref_resolver.rs:1152-1186): links require score >= threshold and
    (when ``type_col`` is given) equal entity types, then
    connected-components assigns one cluster id per component
    (min-reachable-id labels instead of the reference's first-seen
    counter — a stable relabeling of the same partition).
    """
    pairs = box_coref_pairs(boxes, id_col=id_col, threshold=threshold,
                            cell_size=cell_size, block_dims=block_dims)
    if type_col is not None:
        types = boxes.select(F.col(id_col), F.col(type_col))
        pairs = (
            pairs.join(types.withColumnsRenamed(
                {id_col: "id_a", type_col: "type_a"}), "id_a")
            .join(types.withColumnsRenamed(
                {id_col: "id_b", type_col: "type_b"}), "id_b")
            .where(F.col("type_a") == F.col("type_b"))
        )
    nodes = boxes.select(F.col(id_col).alias("key_id"))
    edges = pairs.select(F.col("id_a").alias("key_a"),
                         F.col("id_b").alias("key_b"))
    return connected_components(nodes, edges).withColumnsRenamed(
        {"key_id": id_col, "component_id": "cluster_id"})


def box_conflicts(claims: DataFrame, key_col: str,
                  id_col: str = "claim_id",
                  trust_col: str = "source_trust") -> DataFrame:
    """Contradiction detection among claims about the same subject.

    UncertainBox::detect_conflict transcribed (box_embeddings.rs:
    463-487): two claims conflict when their boxes are (near-)disjoint
    — overlap < 10% of the smaller volume — AND both confidences
    ``1/(1+vol)`` exceed 0.8.  Severity = (1 - overlap/min_vol) * mean
    confidence.

    Scale re-architecture: the reference checks every claim pair; here
    pairs are generated only within ``key_col`` (the entity a claim is
    about), because cross-subject disjointness is not a contradiction —
    and a disjointness predicate cannot be blocked by overlap cells.
    One key-partitioned self-join, no cartesian.
    """
    a = claims.select(
        F.col(key_col).alias("subject"),
        F.col(id_col).alias("claim_a"),
        F.col("box_min").alias("a_min"), F.col("box_max").alias("a_max"),
        F.col(trust_col).alias("claim_a_trust"))
    b = claims.select(
        F.col(key_col).alias("subject"),
        F.col(id_col).alias("claim_b"),
        F.col("box_min").alias("b_min"), F.col("box_max").alias("b_max"),
        F.col(trust_col).alias("claim_b_trust"))
    pairs = a.join(b, "subject").where(F.col("claim_a") < F.col("claim_b"))
    scored = with_box_score(pairs)
    conf_a = 1.0 / (1.0 + F.col("vol_a"))
    conf_b = 1.0 / (1.0 + F.col("vol_b"))
    min_vol = F.least(F.col("vol_a"), F.col("vol_b"))
    return (
        scored.withColumn("conf_a", conf_a)
        .withColumn("conf_b", conf_b)
        .where((F.col("inter_vol") < min_vol * 0.1)
               & (F.col("conf_a") > 0.8) & (F.col("conf_b") > 0.8))
        .withColumn(
            "severity",
            (F.lit(1.0) - F.col("inter_vol") / F.greatest(min_vol, F.lit(1e-6)))
            * (F.col("conf_a") + F.col("conf_b")) / 2.0)
        .select("subject", "claim_a", "claim_b",
                "claim_a_trust", "claim_b_trust", "severity")
    )

"""X1–X7 — cross-document entity resolution at scale (SURVEY §2.6).

The reference resolver (anno/src/eval/cdcr.rs:420-578) union-finds over
*mentions*. The scale-correct reformulation used here exploits an exact
equivalence: two mentions with identical ``(lower(text), entity_type)``
always cluster together (identical lowercased text ⇒ identical minhash
signature ⇒ same LSH buckets ⇒ candidate pair; string_similarity = 1.0 ≥
any threshold; types equal). Therefore the mention graph's connected
components equal the components of the **distinct-surface graph** whose
nodes are ``(lower(text), entity_type)`` keys. On a 10¹²-mention corpus
that drops the clustering problem from 10¹² nodes to ~10⁸ distinct
surfaces — mentions re-attach to their key's component with one hash join.

Stages (each a narrow DataFrame op; shuffles only where marked):

1. ``surface_keys``     — distinct (surface, entity_type) + mention counts
                          [shuffle: groupBy key]
2. ``band_table``       — minhash/LSH band hashes per key (pandas UDF,
                          exact FNV-1a parity with cdcr.rs:350-402)
3. ``candidate_pairs``  — self-equi-join on (band, band_hash)
                          [shuffle: the LSH join; AQE skew-split on;
                          optional max_bucket_size cap for stop-surface
                          buckets — the explicit salting/skew lever]
4. ``score_pairs``      — string_similarity ≥ τ + type gate, entirely in
                          JVM expressions (no Python in the pair hot path)
5. ``connected_components`` — iterative min-label propagation with
                          per-iteration localCheckpoint (SURVEY §4 #2)
6. ``identities``       — per-component canonicalization + KB link
                          [shuffle: groupBy component]
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anno_spark.plans.iterloop import iter_checkpoint
from anno_spark.plans.sizing import (
    checkpoint_count,
    fits_broadcast,
    in_dropped_buckets,
    probe_spread,
)

MIN_SIMILARITY = 0.5  # cdcr.rs:433-442 default

CDCR_NUM_BANDS = 5  # band_table emits exactly this many rows per key
# Broadcast payload per key in the small path: 5 exploded band rows
# (~24 B each) + the attrs row (surface string, type, word-set array).
CDCR_BYTES_PER_KEY_EST = 400


# --------------------------------------------------------------------------
# 1. distinct surface keys


def surface_keys(mentions: DataFrame) -> DataFrame:
    """mentions → distinct (surface, entity_type) keys with stats.

    surface = lower(text); key_id = xxhash64(surface, entity_type)
    (content-derived: stable across runs and cluster sizes, SURVEY §7.4).
    """
    # two-step aggregation instead of countDistinct: the expand-based
    # distinct doubles the shuffled row count on the full mention table;
    # aggregating (surface, type, url) first shrinks the second shuffle
    # to the per-doc-distinct size
    has_ts = "warc_ts" in mentions.columns
    cols = [
        F.lower(F.col("text")).alias("surface"),
        F.col("entity_type"),
        F.col("url"),
    ] + ([F.col("warc_ts")] if has_ts else [])
    per_doc = (
        mentions.select(*cols)
        .groupBy("surface", "entity_type", "url")
        .agg(
            F.count("*").alias("n_in_doc"),
            *([F.min("warc_ts").alias("doc_ts")] if has_ts else []),
        )
    )
    return (
        per_doc.groupBy("surface", "entity_type")
        .agg(
            F.sum("n_in_doc").alias("n_mentions"),
            F.count("*").alias("n_docs"),
            # G2 temporal property (graph.rs:249-290): earliest observation
            *([F.min("doc_ts").alias("first_seen")] if has_ts else []),
        )
        .withColumn("key_id", F.xxhash64("surface", "entity_type"))
    )


# --------------------------------------------------------------------------
# 2. minhash band hashes (exact FNV-1a parity, cdcr.rs:350-402)


def _band_hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from anno_spark.core.minhash import band_hashes, compute_signature, to_i64

    for pdf in batches:
        out_bands = [
            [to_i64(b) for b in band_hashes(compute_signature(s or ""))]
            for s in pdf["surface"]
        ]
        yield pd.DataFrame(
            {
                "key_id": pdf["key_id"],
                "surface": pdf["surface"],
                "entity_type": pdf["entity_type"],
                "band_hashes": out_bands,
            }
        )


def band_signatures(keys: DataFrame) -> DataFrame:
    """keys → (key_id, band_hashes array<bigint>), the unexploded LSH
    band-hash vector per key (5 bands × 3 rows, cdcr.rs:288-296).

    The array form exists for the small path's emit-once pair dedup
    (see :func:`candidate_pairs`): with both keys' vectors attached from
    a broadcast, "is this raw join row the pair's first shared surviving
    band?" is a map-side expression, and no pairs-proportional shuffle
    is ever needed."""
    return keys.select("key_id", "surface", "entity_type").mapInPandas(
        _band_hash_batches,
        schema="key_id bigint, surface string, entity_type string, band_hashes array<bigint>",
    ).select("key_id", "band_hashes")


def band_table(keys: DataFrame) -> DataFrame:
    """keys → (key_id, band, band_hash), one row per LSH band
    (5 bands × 3 rows, cdcr.rs:288-296). Compact on purpose: the join
    shuffles nothing but ids and hashes."""
    return band_signatures(keys).select(
        "key_id",
        F.posexplode("band_hashes").alias("band", "band_hash"),
    )


# --------------------------------------------------------------------------
# 3. LSH candidate pairs


def candidate_pairs(
    bands: DataFrame,
    keys: DataFrame,
    max_bucket_size: int | None = None,
    broadcast_max_keys: int = 1_000_000,
    _pre_dedup: bool = False,
    band_sigs: DataFrame | None = None,
    _n_band_rows: int | None = None,
) -> DataFrame:
    """Self-join on (band, band_hash) → distinct key pairs (a < b), with
    surfaces/types re-attached AFTER dedup (the pre-dedup blowup carries
    only ids and hashes through the shuffle).

    Join strategy: checkpointed inputs hide size stats from Catalyst, so
    when the distinct-key count fits comfortably in a broadcast
    (≤ ``broadcast_max_keys``) the right side and the attribute
    dimension get explicit broadcast hints — measured 6× over the
    sort-merge plan at 2·10⁴ keys / 10⁸ joined rows. Beyond the
    threshold (true web scale, ~10⁸ surfaces) it falls back to the
    shuffled join and AQE's skew splitting.

    ``max_bucket_size`` caps pathological buckets (the "the company"
    stop-surface problem, SURVEY §7.5): buckets larger than the cap are
    dropped *for candidate generation only* — at web scale a bucket with
    10⁵ distinct surfaces contributes 10¹⁰ pairs and is always a
    stop-surface artifact. None = exact reference parity.

    ``band_sigs`` — the (key_id, band_hashes) table ``bands`` was
    exploded from (:func:`band_signatures`). When provided on the small
    path, pair dedup runs MAP-SIDE (emit-once: a pair is kept only in
    the row whose band is its first shared *surviving* band, dropped
    buckets masked to NULL in the broadcast-attached vectors), removing
    the last pairs-proportional shuffle (the dropDuplicates exchange
    carried ~bands× the distinct-pair count). Identical output set.

    Emit-once additionally requires ``max_bucket_size``: it attaches
    both keys' attribute+signature broadcasts to EVERY pre-dedup row,
    so its per-row work must ride a raw stream the bucket cap bounds
    (≤ kept_buckets·cap²/2 rows). Uncapped, one hot stop-surface bucket
    makes raw quadratic and the compact id-only dropDuplicates shuffle
    is strictly cheaper — measured 2.1× (139 s vs 286 s resolve stage,
    400k synthetic pages, local[16], cap=None) while at cap=256 the two
    are at parity with emit-once one exchange ahead.
    """
    # ONE job: lazy checkpoint + exact count (bands is consumed twice by
    # the self-join; the count also feeds the broadcast gate, replacing
    # the separate keys.limit().count() job — VERDICT r02 wrong #4).
    # band_table emits exactly CDCR_NUM_BANDS rows per key, so the key
    # count is derived, and the gate is byte-based (ADVICE r02).
    # ``_n_band_rows`` lets resolve_mentions pass an already-counted,
    # already-checkpointed band table without a second count job.
    if _n_band_rows is not None:
        n_band_rows = _n_band_rows
    else:
        bands, n_band_rows = checkpoint_count(bands)
    n_keys = n_band_rows // CDCR_NUM_BANDS
    small = n_keys <= broadcast_max_keys and fits_broadcast(
        n_keys, CDCR_BYTES_PER_KEY_EST
    )
    maybe_broadcast = F.broadcast if small else (lambda df: df)
    emit_once = (
        small
        and band_sigs is not None
        and not _pre_dedup
        and max_bucket_size is not None
    )
    dropped_buckets: list | None = None
    if max_bucket_size is not None:
        sizes = bands.groupBy("band", "band_hash").agg(
            F.count("*").alias("bucket_n")
        )
        if emit_once:
            # tiny by construction (every dropped bucket holds > cap
            # members); as a driver literal, bucket survival becomes
            # decidable map-side — see plans/sizing.in_dropped_buckets
            dropped_buckets = [
                (int(r["band"]), int(r["band_hash"]))
                for r in sizes.where(F.col("bucket_n") > max_bucket_size).collect()
            ]
            if dropped_buckets:
                bands = bands.where(
                    ~in_dropped_buckets(
                        dropped_buckets, F.col("band"), F.col("band_hash")
                    )
                )
        else:
            bands = bands.join(
                maybe_broadcast(sizes.where(F.col("bucket_n") <= max_bucket_size)),
                ["band", "band_hash"],
            ).drop("bucket_n")
    # spread the probe side: AQE coalesces the small band table into a
    # handful of partitions, but the join EXPLODES output ~10²–10³× (hot
    # buckets), so the probe side must be pre-spread or the explosion
    # runs on 2-4 tasks. Round-robin keeps hot buckets balanced. The
    # spread is sized to the DATA (≥2k band rows per task, capped at
    # 4×parallelism): a fixed 128-way spread on a 15k-row table is ~100
    # empty tasks × 3 downstream stage jobs of pure scheduler fixed cost
    # (VERDICT r03 next #4), while at web scale the cap still yields the
    # full 4×par fan-out.
    par = bands.sparkSession.sparkContext.defaultParallelism
    left = bands.select("band", "band_hash", F.col("key_id").alias("key_a"))
    if small:
        left = left.repartition(probe_spread(par, n_band_rows))
    right = bands.select("band", "band_hash", F.col("key_id").alias("key_b"))
    raw = left.join(maybe_broadcast(right), ["band", "band_hash"]).where(
        F.col("key_a") < F.col("key_b")
    )
    if _pre_dedup:
        # diagnostic surface for the skew soak: the PRE-dedup pair
        # stream, partitioned exactly as the explosion map stage runs it
        # (the dedup shuffle would rebalance and hide any imbalance)
        return raw.select("key_a", "key_b")
    # attach surfaces + PRECOMPUTED word sets: the scoring pass over the
    # (huge, mostly-rejected) pair table then allocates one array per
    # pair (the intersect) instead of re-splitting both surfaces — the
    # difference between GC-bound and CPU-bound at 10⁷ candidate pairs
    attrs = keys.select(
        "key_id",
        "surface",
        "entity_type",
        _word_set(F.col("surface")).alias("words"),
    ).withColumn("n_words", F.size("words"))
    if emit_once:
        # map-side dedup: keep the row whose band is the pair's first
        # shared SURVIVING band. The masked band-hash vectors ride the
        # same per-side broadcast as the attrs (one join per side); the
        # filter then drops the ~bands× band-duplicates before anything
        # shuffles, so the whole path from explosion to scored pairs is
        # exchange-free past the fixed-size probe spread.
        masked = F.col("band_hashes")
        if dropped_buckets:
            masked = F.transform(
                F.col("band_hashes"),
                lambda h, i: F.when(
                    ~in_dropped_buckets(dropped_buckets, i, h), h
                ),
            )
        enriched = attrs.join(
            band_sigs.select("key_id", masked.alias("mbh")), "key_id"
        )
        first_shared = F.array_position(
            F.zip_with("mbh_a", "mbh_b", lambda a, b: a == b), F.lit(True)
        )
        return (
            raw.join(
                F.broadcast(
                    enriched.select(
                        F.col("key_id").alias("key_a"),
                        F.col("surface").alias("surface_a"),
                        F.col("entity_type").alias("type_a"),
                        F.col("words").alias("words_a"),
                        F.col("n_words").alias("nw_a"),
                        F.col("mbh").alias("mbh_a"),
                    )
                ),
                "key_a",
            )
            .join(
                F.broadcast(
                    enriched.select(
                        F.col("key_id").alias("key_b"),
                        F.col("surface").alias("surface_b"),
                        F.col("entity_type").alias("type_b"),
                        F.col("words").alias("words_b"),
                        F.col("n_words").alias("nw_b"),
                        F.col("mbh").alias("mbh_b"),
                    )
                ),
                "key_b",
            )
            .where(F.col("band") + F.lit(1) == first_shared)
            .drop("band", "band_hash", "mbh_a", "mbh_b")
        )
    pairs = raw.select("key_a", "key_b").dropDuplicates(["key_a", "key_b"])
    return pairs.join(
        maybe_broadcast(
            attrs.select(
                F.col("key_id").alias("key_a"),
                F.col("surface").alias("surface_a"),
                F.col("entity_type").alias("type_a"),
                F.col("words").alias("words_a"),
                F.col("n_words").alias("nw_a"),
            )
        ),
        "key_a",
    ).join(
        maybe_broadcast(
            attrs.select(
                F.col("key_id").alias("key_b"),
                F.col("surface").alias("surface_b"),
                F.col("entity_type").alias("type_b"),
                F.col("words").alias("words_b"),
                F.col("n_words").alias("nw_b"),
            )
        ),
        "key_b",
    )


# --------------------------------------------------------------------------
# 4. pair scoring — string_similarity (similarity.rs:37-92) as JVM exprs


def _word_set(col):
    # Python str.split() ≡ split on \s+ runs, dropping empties.
    # (?U) makes Java \s match Unicode whitespace like Python's split().
    arr = F.split(F.trim(col), r"(?U)\s+")
    return F.array_distinct(F.filter(arr, lambda w: w != F.lit("")))


def string_similarity_expr(a, b):
    """JVM-side string_similarity: 1.0 exact → 0.8 containment →
    word-set Jaccard. Inputs are already lowercased surfaces."""
    wa, wb = _word_set(a), _word_set(b)
    inter = F.size(F.array_intersect(wa, wb))
    union = F.size(F.array_union(wa, wb))
    jacc = F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
    return (
        F.when((a == "") & (b == ""), F.lit(1.0))
        .when((a == "") | (b == ""), F.lit(0.0))
        .when(a == b, F.lit(1.0))
        .when(F.instr(a, b) > 0, F.lit(0.8))
        .when(F.instr(b, a) > 0, F.lit(0.8))
        .otherwise(jacc)
    )


def score_pairs(
    pairs: DataFrame,
    min_similarity: float = MIN_SIMILARITY,
    require_type_match: bool = True,
) -> DataFrame:
    """should_cluster (cdcr.rs:539-548) → surviving alias edges.

    Uses the precomputed word sets from :func:`candidate_pairs` when
    available (one array allocation per pair); falls back to the
    self-contained expression otherwise.
    """
    if "words_a" in pairs.columns:
        a, b = F.col("surface_a"), F.col("surface_b")
        ni = F.size(F.array_intersect("words_a", "words_b"))
        union = F.col("nw_a") + F.col("nw_b") - ni
        jacc = F.when(union == 0, F.lit(0.0)).otherwise(
            ni.cast("double") / union.cast("double")
        )
        sim = (
            F.when((a == "") & (b == ""), F.lit(1.0))
            .when((a == "") | (b == ""), F.lit(0.0))
            .when(a == b, F.lit(1.0))
            .when(F.instr(a, b) > 0, F.lit(0.8))
            .when(F.instr(b, a) > 0, F.lit(0.8))
            .otherwise(jacc)
        )
        scored = pairs.withColumn("similarity", sim)
    else:
        scored = pairs.withColumn(
            "similarity",
            string_similarity_expr(F.col("surface_a"), F.col("surface_b")),
        )
    if require_type_match:
        scored = scored.where(F.col("type_a") == F.col("type_b"))
    return scored.where(F.col("similarity") >= F.lit(min_similarity)).select(
        "key_a", "key_b", "similarity"
    )


# --------------------------------------------------------------------------
# 5. iterative connected components (union-find as a DataFrame loop)


def uf_labels(key_a, key_b):
    """Vectorized connected components over an edge list of raw 64-bit
    ids → ``(uniq_sorted_ids, component_label_per_id)`` with
    component label = min id reachable (the labeling every CC consumer
    in this engine uses).

    Hook + pointer-jump with per-round EDGE CONTRACTION (r06): running
    ``np.minimum.at`` over the full edge list every round — unbuffered
    scatter at ~10M ops/s — cost 1-2 s of driver wall on the 1.36M-edge
    sf1.0 graph. Contracting each round's edges to distinct
    (parent_hi, parent_lo) label pairs collapses the near-dup cliques
    after one pass (round-2 edge count ≈ the component count), and the
    sorted-unique form gives each hi's min lo for free, so the
    scatter-min disappears entirely. Labels still converge to the
    component minimum (hooks only decrease toward the min, the min's
    own label is never touched, and termination = no cross-label edges
    remain). ``uniq`` is sorted, so the minimum dense index in a
    component is exactly the minimum id."""
    import numpy as np

    both = np.concatenate(
        [np.asarray(key_a, dtype=np.int64), np.asarray(key_b, dtype=np.int64)]
    )
    uniq, inv = np.unique(both, return_inverse=True)
    n_edges = len(both) // 2
    n = len(uniq)
    ea, eb = inv[:n_edges], inv[n_edges:]
    parent = np.arange(n)
    while True:
        pa, pb = parent[ea], parent[eb]
        alive = pa != pb
        if not alive.any():
            break
        pa, pb = pa[alive], pb[alive]
        lo = np.minimum(pa, pb)
        hi = np.maximum(pa, pb)
        key = np.unique(hi.astype(np.uint64) * np.uint64(n) + lo.astype(np.uint64))
        hi = (key // np.uint64(n)).astype(np.int64)
        lo = (key % np.uint64(n)).astype(np.int64)
        # keys sort by (hi, lo): the first row per hi carries its min lo
        first = np.ones(len(hi), dtype=bool)
        first[1:] = hi[1:] != hi[:-1]
        fh, fl = hi[first], lo[first]
        parent[fh] = np.minimum(parent[fh], fl)
        while True:  # pointer jumping: parent := parent[parent]
            jumped = parent[parent]
            if np.array_equal(jumped, parent):
                break
            parent = jumped
        ea, eb = hi, lo  # contracted label graph feeds the next round
    return uniq, uniq[parent]


def _driver_union_find(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Small-graph fast path: union-find with path compression on the
    driver over the (already materialized) edge list, then ONE broadcast
    join back onto the still-distributed node table. Only edges are
    collected — nodes can be arbitrarily large (singletons keep their own
    id via coalesce). Produces byte-identical output to the distributed
    loop: component_id = min key_id reachable.

    PRECONDITION (shared with :func:`connected_components`): every edge
    endpoint must appear in ``nodes``. With an edge-only id the two paths
    diverge — this path merges components THROUGH (and can label with)
    the absent id, while the distributed loop never propagates through
    unlabeled endpoints (ADVICE r02). Every in-repo caller derives edges
    from the node table (candidate pairs ⊆ keys; dedup pairs ⊆ sig
    table), so the contract is documented rather than paid for with two
    extra semi-joins per invocation on a 10⁸-row edge table."""
    import pandas as pd

    pdf = edges.select("key_a", "key_b").toPandas()
    uniq, labels = uf_labels(pdf["key_a"].to_numpy(), pdf["key_b"].to_numpy())
    spark = nodes.sparkSession
    comp = spark.createDataFrame(
        pd.DataFrame({"key_id": uniq, "component_id": labels}),
        schema="key_id bigint, component_id bigint",
    )
    return nodes.select("key_id").join(F.broadcast(comp), "key_id", "left").select(
        "key_id",
        F.coalesce("component_id", F.col("key_id")).alias("component_id"),
    )


# Edge-count gate for the driver fast path: 5M edges ≈ 80 MB collected,
# comparable to a default broadcast side. Above it (true web scale) the
# distributed loop runs. The gate counts EDGES only — the node table is
# never collected at any size.
DRIVER_CC_MAX_EDGES = 5_000_000


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int = 25,
    driver_max_edges: int | None = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """→ (key_id, component_id) where component_id = min key_id reachable.

    Edge endpoints MUST be a subset of ``nodes`` (see
    :func:`_driver_union_find` for why the two paths diverge otherwise).

    Small graphs (≤ ``driver_max_edges`` edges after scoring) take the
    driver union-find fast path — the same size-gated pattern as a
    broadcast join, saving ~10 shuffle barriers of fixed latency.

    At scale: min-label propagation with pointer jumping — each round a
    node adopts the minimum label among itself and its neighbors (edge
    step), then labels chase their own label's label (label-compression
    step, the union-find path-halving analogue) — convergence in
    O(log diameter) rounds instead of O(diameter). One localCheckpoint
    per round truncates lineage (SURVEY §4 #2).
    """
    # materialize edges first: symmetrization reads them twice, and the
    # edge lineage typically contains the expensive LSH join + scoring.
    # Lazy checkpoint + count = ONE job for materialize + size gate
    # (VERDICT r02 wrong #4).
    from anno_spark.plans.sizing import force_fallback

    edges, n_edges = checkpoint_count(edges)
    if (
        driver_max_edges is not None
        and n_edges <= driver_max_edges
        and not force_fallback()
    ):
        return _driver_union_find(nodes, edges)
    # no dedup on the symmetrized table: every in-repo producer emits
    # DISTINCT key_a < key_b pairs (emit-once band dedup / min-shared-
    # cell box dedup), so the union cannot collide and a dropDuplicates
    # here was one full edge-table exchange of pure waste before the
    # groupBy. Duplicate edges from an outside caller stay CORRECT —
    # every consumer below is a min-aggregation, so dupes only inflate
    # intermediate rows, never change a label (pinned by
    # tests/test_connected_components.py::
    # test_duplicate_edges_change_nothing_either_path).
    sym = (
        edges.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
        .union(
            edges.select(F.col("key_b").alias("src"), F.col("key_a").alias("dst"))
        )
        .localCheckpoint()
    )
    # seed labels with min(self, neighbors) — one aggregation that saves a
    # full propagation round (most components converge a round earlier)
    nbr0 = sym.groupBy(F.col("src").alias("key_id")).agg(
        F.min("dst").alias("nbr_min")
    )
    labels = (
        nodes.select("key_id")
        .join(nbr0, "key_id", "left")
        .select(
            "key_id",
            F.least(
                F.col("key_id"), F.coalesce("nbr_min", F.col("key_id"))
            ).alias("component_id"),
        )
        .localCheckpoint()
    )

    for it in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["key_id"])
            .select(F.col("dst").alias("key_id"), "component_id")
            .groupBy("key_id")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        stepped = labels.join(neighbor_min, "key_id", "left").select(
            "key_id",
            F.least(
                F.col("component_id"),
                F.coalesce(F.col("nbr_min"), F.col("component_id")),
            ).alias("component_id"),
            F.col("component_id").alias("prev_component_id"),
        )
        # pointer jumping: component_id := label(component_id)
        parent = stepped.select(
            F.col("key_id").alias("component_id"),
            F.col("component_id").alias("jumped"),
        )
        updated = (
            stepped.join(parent, "component_id", "left")
            .select(
                "key_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("jumped"), F.col("component_id")),
                ).alias("component_id"),
                (
                    F.least(
                        F.col("component_id"),
                        F.coalesce(F.col("jumped"), F.col("component_id")),
                    )
                    != F.col("prev_component_id")
                ).alias("changed"),
            )
        )
        updated = iter_checkpoint(updated)
        labels = updated.select("key_id", "component_id")
        # `updated` was just localCheckpointed, so the convergence probe
        # scans cached partitions (~0.1s) — far cheaper than one wasted
        # propagation round; probe every round and break ASAP
        if len(updated.where("changed").take(1)) == 0:
            break
    return labels


# --------------------------------------------------------------------------
# 6. identities


def identities_table(
    keys: DataFrame, components: DataFrame
) -> DataFrame:
    """Per-component canonical entity (X5, resolver.rs:151-214) with a
    deterministic canonical pick: most mentions, ties → lexicographically
    greatest surface (documented divergence from the reference's HashMap
    order, SURVEY §7.3). KB ids via broadcast lookup (C5)."""
    from anno_spark.core.document import KNOWN_KB_ENTITIES

    keyed = keys.join(components, "key_id")
    # tiebreak struct carries entity_type as the last key: the same surface
    # can occur under two types with equal counts, and max_by over a
    # 2-field struct would pick between them nondeterministically
    pick = F.struct(F.col("n_mentions"), F.col("surface"), F.col("entity_type"))
    has_ts = "first_seen" in keys.columns
    idents = keyed.groupBy("component_id").agg(
        F.max_by("surface", pick).alias("canonical_name"),
        F.max_by("entity_type", pick).alias("entity_type"),
        F.sum("n_mentions").alias("n_mentions"),
        F.sum("n_docs").alias("n_docs"),
        F.count("*").alias("n_surfaces"),
        F.sort_array(F.collect_set("surface")).alias("aliases"),
        *([F.min("first_seen").alias("first_seen")] if has_ts else []),
    )
    spark = keys.sparkSession
    kb = spark.createDataFrame(
        [(name, qid, desc) for name, (qid, desc) in KNOWN_KB_ENTITIES.items()],
        "canonical_lower string, kb_id string, kb_description string",
    )
    return (
        idents.withColumn("canonical_lower", F.lower("canonical_name"))
        .join(F.broadcast(kb), "canonical_lower", "left")
        .drop("canonical_lower")
        .withColumnRenamed("component_id", "identity_id")
    )


def top_clusters(
    identities: DataFrame,
    min_mentions: int = 1,
    min_docs: int = 1,
    entity_types=None,
    limit: int | None = 20,
) -> DataFrame:
    """X7 — cluster filter / rank / limit (anno-cli crossdoc.rs:489-520):
    keep identities with ≥ min_mentions mentions and ≥ min_docs docs
    (optionally restricted to ``entity_types``), ranked by
    (n_docs, n_mentions, canonical_name) descending — the reference's
    (doc_count, size, name) desc sort — with a deterministic global limit.

    Scale note: a global top-k orderBy+limit is a TakeOrderedAndProject
    (per-partition top-k then a k-row merge on the driver) — no full sort
    shuffle.
    """
    out = identities.where(
        (F.col("n_mentions") >= min_mentions) & (F.col("n_docs") >= min_docs)
    )
    if entity_types:
        out = out.where(F.col("entity_type").isin(list(entity_types)))
    out = out.orderBy(
        F.desc("n_docs"),
        F.desc("n_mentions"),
        F.desc("canonical_name"),
        F.asc("identity_id"),
    )
    return out.limit(limit) if limit is not None else out


# --------------------------------------------------------------------------
# end-to-end convenience

# Key-count gate for the all-driver resolve fast path below: band/pair/
# score/CC work on a few thousand distinct surfaces costs milliseconds
# in-process but ~7 Spark jobs of fixed scheduler+broadcast latency
# distributed (measured 1.6 s of the sf1.0 bench on a 2.5k-key,
# 1.3k-edge graph). 20k keys ≈ tens of ms of driver scoring on typical
# bucket shapes; past the gate (true web scale) the distributed path
# runs unchanged.
DRIVER_RESOLVE_MAX_KEYS = 20_000


def _driver_resolve_components(
    keys: DataFrame,
    band_sigs: DataFrame,
    max_bucket_size: int | None,
    min_similarity: float,
    require_type_match: bool,
) -> tuple[DataFrame, DataFrame]:
    """Small-graph fast path for the whole candidate→score→CC→identities
    chain: collect the (already materialized) key rows and band-hash
    vectors, generate bucket pairs, score with the pure-Python
    string_similarity (the reference implementation the JVM expression
    is differentially pinned against —
    tests/test_spark_pipeline.py::test_string_similarity_expr_parity), and
    union-find in-process. Returns ``(components, identities)`` with the
    same (key_id, component_id) labeling as candidate_pairs →
    score_pairs → connected_components —
    component_id = min key_id reachable. Bucket-cap semantics replicated
    exactly (buckets with > cap members dropped for candidate
    generation). The scoring decision is inlined on the STORED surfaces
    (no re-lowercasing — the distributed expression scores them as
    stored too): exact → 1.0, containment → 0.8, else word-set Jaccard,
    with ``split()`` ≡ the JVM ``_word_set`` (differentially pinned)."""
    spark = keys.sparkSession
    krows = keys.collect()  # full rows: the identities build below needs
    # n_mentions/n_docs/first_seen alongside surface/entity_type
    brows = band_sigs.collect()
    bh_by_key = {r["key_id"]: r["band_hashes"] for r in brows}
    buckets: dict[tuple[int, int], list] = {}
    for r in krows:
        for band, h in enumerate(bh_by_key[r["key_id"]]):
            buckets.setdefault((band, h), []).append(r)
    words = {r["key_id"]: frozenset(r["surface"].split()) for r in krows}
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    seen: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        if max_bucket_size is not None and len(members) > max_bucket_size:
            continue
        for i in range(len(members)):
            a = members[i]
            for j in range(i + 1, len(members)):
                b = members[j]
                ka, kb = a["key_id"], b["key_id"]
                if ka > kb:
                    ka, kb = kb, ka
                if (ka, kb) in seen:
                    continue
                seen.add((ka, kb))
                if require_type_match and a["entity_type"] != b["entity_type"]:
                    continue
                sa, sb = a["surface"], b["surface"]
                if sa == sb:
                    sim = 1.0
                elif not sa or not sb:
                    sim = 0.0
                elif sb in sa or sa in sb:
                    sim = 0.8
                else:
                    wa, wb = words[a["key_id"]], words[b["key_id"]]
                    union = len(wa | wb)
                    sim = len(wa & wb) / union if union else 0.0
                if sim < min_similarity:
                    continue
                ra, rb = find(ka), find(kb)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
    comp_rows = [(int(k), int(find(k))) for k in sorted(parent)]
    # identities built from the SAME collected rows (r06): the
    # distributed identities_table is one groupBy + a broadcast KB join
    # over a table this path has already collected — ~3 more jobs of
    # fixed latency for in-hand data. Exact replication of its
    # semantics: canonical pick = max by (n_mentions, surface,
    # entity_type) — Python tuple comparison ≡ Spark struct comparison
    # (longs by value; strings by code point ≡ UTF-8 binary order);
    # aliases = sorted distinct surfaces (same order property); KB
    # lookup on the lowercased canonical (surfaces are already
    # lowercase); first_seen = min, round-tripped as session-local
    # datetimes. Pinned column-for-column by
    # tests/test_driver_resolve.py against the distributed build.
    from anno_spark.core.document import KNOWN_KB_ENTITIES

    comp_of = dict(comp_rows)
    groups: dict[int, list] = {}
    for r in krows:
        groups.setdefault(comp_of.get(r["key_id"], r["key_id"]), []).append(r)
    has_ts = "first_seen" in keys.columns
    ident_rows = []
    for cid, rows in groups.items():
        pick = max(
            rows, key=lambda r: (r["n_mentions"], r["surface"], r["entity_type"])
        )
        kb = KNOWN_KB_ENTITIES.get(pick["surface"].lower())
        ident_rows.append(
            (
                int(cid),
                pick["surface"],
                pick["entity_type"],
                int(sum(r["n_mentions"] for r in rows)),
                int(sum(r["n_docs"] for r in rows)),
                len(rows),
                sorted({r["surface"] for r in rows}),
            )
            + ((min(r["first_seen"] for r in rows),) if has_ts else ())
            + ((kb[0], kb[1]) if kb else (None, None))
        )
    ident_schema = (
        "identity_id bigint, canonical_name string, entity_type string, "
        "n_mentions bigint, n_docs bigint, n_surfaces bigint, "
        "aliases array<string>, "
        + ("first_seen timestamp, " if has_ts else "")
        + "kb_id string, kb_description string"
    )
    idents = spark.createDataFrame(ident_rows, schema=ident_schema)
    if not comp_rows:
        return (
            keys.select("key_id", F.col("key_id").alias("component_id")),
            idents,
        )
    comp = spark.createDataFrame(
        comp_rows, schema="key_id bigint, component_id bigint"
    )
    comps = keys.select("key_id").join(
        F.broadcast(comp), "key_id", "left"
    ).select(
        "key_id",
        F.coalesce("component_id", F.col("key_id")).alias("component_id"),
    )
    return comps, idents


def resolve_mentions(
    mentions: DataFrame,
    min_similarity: float = MIN_SIMILARITY,
    require_type_match: bool = True,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """mentions → (keys_with_components, identities, mention_identity).

    mention_identity maps every mention back to its identity with one
    hash join on the surface key — the only touch of the full mention
    table after extraction.

    ``keys`` and ``components`` are materialized once (localCheckpoint)
    before fan-out: both are consumed by three downstream branches, and
    they are tiny relative to the corpus (distinct surfaces ≪ mentions).
    The checkpoints are LAZY — the first consumer's action materializes
    them and later consumers read the cache, saving one dedicated
    materialization job each (fixed-cost latency that at a 140 ms/job
    scheduler floor is pure waste; VERDICT r03 next #4). On a real
    cluster these become snapshot tables (SnapshotStore).
    """
    from anno_spark.plans.sizing import force_fallback

    keys = surface_keys(mentions).localCheckpoint(eager=False)
    # unexploded band vectors, cached: explode feeds the self-join, the
    # array form feeds the small path's map-side emit-once pair dedup
    band_sigs = band_signatures(keys).localCheckpoint(eager=False)
    bands = band_sigs.select(
        "key_id", F.posexplode("band_hashes").alias("band", "band_hash")
    )
    # one job materializes keys+band_sigs+bands and yields the key count
    # for BOTH the driver-resolve gate and candidate_pairs' broadcast gate
    bands, n_band_rows = checkpoint_count(bands)
    n_keys = n_band_rows // CDCR_NUM_BANDS
    if n_keys <= DRIVER_RESOLVE_MAX_KEYS and not force_fallback():
        # all-driver fast path: pair-gen + scoring + CC + identities
        # in-process (see _driver_resolve_components) — ~10 Spark jobs
        # of broadcast/shuffle fixed latency collapse into two
        # cache-read collects
        comps, idents = _driver_resolve_components(
            keys, band_sigs, max_bucket_size, min_similarity, require_type_match
        )
        comps = comps.localCheckpoint(eager=False)
    else:
        pairs = candidate_pairs(
            bands,
            keys,
            max_bucket_size=max_bucket_size,
            band_sigs=band_sigs,
            _n_band_rows=n_band_rows,
        )
        edges = score_pairs(pairs, min_similarity, require_type_match)
        comps = connected_components(keys, edges).localCheckpoint(eager=False)
        idents = identities_table(keys, comps)
    keyed = keys.join(comps, "key_id").select(
        "surface", "entity_type", F.col("component_id").alias("identity_id")
    )
    mention_identity = mentions.withColumn(
        "surface", F.lower(F.col("text"))
    ).join(keyed, ["surface", "entity_type"])
    return keys.join(comps, "key_id"), idents, mention_identity

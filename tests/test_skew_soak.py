"""Adversarial skew soak for the CDCR resolve stage (VERDICT r03 next
#5): 30% of mentions share one hot surface, one domain dominates, and
60% are near-identical distinct surfaces whose shingles collide into
giant LSH buckets — the stop-surface regime (SURVEY §7.5, reference
behavior anno/src/cdcr.rs:314-347).

The gates are DATA-deterministic (partition row histograms, bucket
counts), not wall-clock — this host's scheduler jitter would drown any
task-duration assertion, and the row distribution IS what bounds task
time on healthy hardware.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bench import skew_soak, skewed_mentions

N_MENTIONS = 200_000
CAP = 256


class TestSkewSoak:
    def test_bucket_cap_drops_giant_buckets_and_explosion_stays_balanced(
        self, spark
    ):
        out = skew_soak(spark, N_MENTIONS, max_bucket_size=CAP)
        # the adversarial corpus really produced over-cap buckets…
        assert out["dropped_buckets"] > 0
        assert out["max_bucket"] > CAP
        # …and the surviving explosion is spread: no task carries more
        # than 4× the median pair volume (an unsalted hot bucket would
        # put its entire s·(s−1)/2 output into ONE task — a ratio of
        # ~n_partitions, not ~4)
        assert out["explosion_partitions"] >= 8
        assert out["explosion_max_over_median"] is not None
        assert out["explosion_max_over_median"] <= 4.0, out
        # resolution still produced identities (cap drops candidate
        # GENERATION in stop-surface buckets, not the keys themselves)
        assert out["n_identities"] > 0
        # total explosion volume is bounded by kept buckets × cap²/2
        kept = out["n_buckets"] - out["dropped_buckets"]
        assert out["explosion_rows"] <= kept * CAP * (CAP - 1) / 2

    def test_hot_identical_surface_collapses_to_one_key(self, spark):
        """The structural skew removal: 60k identical 'Acme Corporation'
        mentions become ONE surface key — the hot mention surface never
        reaches the quadratic stage at multiplicity."""
        from anno_spark.operators import resolve as rx

        keys = rx.surface_keys(skewed_mentions(spark, N_MENTIONS))
        hot = keys.where(F.col("surface") == "acme corporation").collect()
        assert len(hot) == 1
        assert hot[0]["n_mentions"] == N_MENTIONS * 3 // 10

    def test_uncapped_run_would_explode(self, spark):
        """Counter-evidence that the cap is load-bearing: without it the
        same corpus generates ≥20× the candidate volume (the quadratic
        blow-up the cap exists to stop) — pair-count only, never
        materialized wide."""
        from anno_spark.operators import resolve as rx

        keys = rx.surface_keys(
            skewed_mentions(spark, N_MENTIONS)
        ).localCheckpoint()
        bands = rx.band_table(keys).localCheckpoint()
        capped = rx.candidate_pairs(
            bands, keys, max_bucket_size=CAP, _pre_dedup=True
        ).count()
        uncapped = rx.candidate_pairs(
            bands, keys, max_bucket_size=None, _pre_dedup=True
        ).count()
        assert uncapped >= 20 * max(capped, 1), (uncapped, capped)

"""Differential for the r06 all-driver resolve fast path: on a corpus
under the DRIVER_RESOLVE_MAX_KEYS gate, resolve_mentions must produce
byte-identical (key, component) labelings and identities whether the
candidate→score→CC chain runs on the driver or distributed (gate forced
off), with and without a bucket cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mentions(spark):
    # near-identical distinct surfaces (shared 3-gram mass → hot common
    # LSH buckets), two hot families plus containment/jaccard pairs and
    # cross-type collisions
    rows = [(f"https://ex.com/p{i}", f"acme corporation unit {i}", "ORG") for i in range(120)]
    rows += [(f"https://ex.com/q{i}", f"initech holdings division {i}", "ORG") for i in range(40)]
    rows += [
        ("https://ex.com/a", "Acme Corp", "ORG"),
        ("https://ex.com/b", "Acme Corporation", "ORG"),
        ("https://ex.com/c", "acme corporation unit 5", "LOC"),  # type clash
        ("https://ex.com/d", "globex", "ORG"),
        ("https://ex.com/e", "globex corporation", "ORG"),
    ]
    return spark.createDataFrame(rows, "url string, text string, entity_type string")


@pytest.mark.parametrize("cap", [None, 16])
def test_driver_resolve_matches_distributed(spark, monkeypatch, cap):
    from anno_spark.operators import resolve as rx

    m = _mentions(spark)
    keyed_fast, idents_fast, _ = rx.resolve_mentions(m, max_bucket_size=cap)
    fast = {
        (r["surface"], r["entity_type"], r["component_id"])
        for r in keyed_fast.collect()
    }
    fast_idents = {
        (r["identity_id"], r["canonical_name"], r["n_surfaces"])
        for r in idents_fast.collect()
    }

    monkeypatch.setattr(rx, "DRIVER_RESOLVE_MAX_KEYS", -1)
    keyed_slow, idents_slow, _ = rx.resolve_mentions(m, max_bucket_size=cap)
    slow = {
        (r["surface"], r["entity_type"], r["component_id"])
        for r in keyed_slow.collect()
    }
    slow_idents = {
        (r["identity_id"], r["canonical_name"], r["n_surfaces"])
        for r in idents_slow.collect()
    }

    assert fast == slow
    assert fast_idents == slow_idents
    # sanity: the corpus actually clusters (not all singletons)
    assert len({c for (_, _, c) in fast}) < len(fast)


def test_minhash_driver_cluster_assembly_matches_distributed(spark, monkeypatch):
    """r06: the driver cluster-assembly tail of minhash_near_duplicates
    (edges + doc->sig collected, union-find + fan-out in numpy) must
    produce the same (cluster_id, doc_id) set as the distributed
    CC + join + groupBy tail."""
    import anno_spark.operators.dedup as dd

    rows = []
    base = "the quick brown fox jumps over the lazy dog wearing pants "
    for fam in range(12):
        for v in range(6):
            rows.append((fam * 100 + v, base + f"family {fam} variant edit {v % 2}"))
    for i in (5000, 5001):  # identical-signature pair with no edges needed
        rows.append((i, "completely identical text"))
    rows += [(9000 + i, f"unique document number {i} with distinct words {i*7}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    fast = {(r["cluster_id"], r["doc_id"]) for r in dd.minhash_near_duplicates(docs).collect()}
    monkeypatch.setattr(dd, "DRIVER_CLUSTER_MAX_DOCS", -1)
    slow = {(r["cluster_id"], r["doc_id"]) for r in dd.minhash_near_duplicates(docs).collect()}
    assert fast == slow
    assert len(fast) > 0

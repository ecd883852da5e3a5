"""Differential for the r06 all-driver resolve fast path: on a corpus
under the DRIVER_RESOLVE_MAX_KEYS gate, resolve_mentions must produce
byte-identical (key, component) labelings and identities whether the
candidate→score→CC chain runs on the driver or distributed (gate forced
off), with and without a bucket cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


import datetime


def _mentions(spark, with_ts=False):
    # near-identical distinct surfaces (shared 3-gram mass → hot common
    # LSH buckets), two hot families plus containment/jaccard pairs,
    # cross-type collisions, KB-hit surfaces, and canonical tie cases
    # (same n_mentions inside one component)
    rows = [(f"https://ex.com/p{i}", f"acme corporation unit {i}", "ORG") for i in range(120)]
    rows += [(f"https://ex.com/q{i}", f"initech holdings division {i}", "ORG") for i in range(40)]
    rows += [
        ("https://ex.com/a", "Acme Corp", "ORG"),
        ("https://ex.com/b", "Acme Corporation", "ORG"),
        ("https://ex.com/c", "acme corporation unit 5", "LOC"),  # type clash
        ("https://ex.com/d", "globex", "ORG"),
        ("https://ex.com/e", "globex corporation", "ORG"),
        ("https://ex.com/f", "Angela Merkel", "PER"),  # KB hit (Q567)
        ("https://ex.com/g", "Berlin", "LOC"),  # KB hit (Q64)
    ]
    if not with_ts:
        return spark.createDataFrame(
            rows, "url string, text string, entity_type string"
        )
    base = datetime.datetime(2024, 1, 1)
    rows_ts = [
        (u, t, e, base + datetime.timedelta(seconds=i * 37))
        for i, (u, t, e) in enumerate(rows)
    ]
    return spark.createDataFrame(
        rows_ts, "url string, text string, entity_type string, warc_ts timestamp"
    )


def _ident_key(r):
    return (
        r["identity_id"],
        r["canonical_name"],
        r["entity_type"],
        r["n_mentions"],
        r["n_docs"],
        r["n_surfaces"],
        tuple(r["aliases"]),
        r["kb_id"],
        r["kb_description"],
        r["first_seen"] if "first_seen" in r.__fields__ else None,
    )


@pytest.mark.parametrize("cap", [None, 16])
@pytest.mark.parametrize("with_ts", [False, True])
def test_driver_resolve_matches_distributed(spark, monkeypatch, cap, with_ts):
    from anno_spark.operators import resolve as rx

    m = _mentions(spark, with_ts=with_ts)
    keyed_fast, idents_fast, _ = rx.resolve_mentions(m, max_bucket_size=cap)
    fast = {
        (r["surface"], r["entity_type"], r["component_id"])
        for r in keyed_fast.collect()
    }
    assert sorted(idents_fast.columns) == sorted(
        ["identity_id", "canonical_name", "entity_type", "n_mentions",
         "n_docs", "n_surfaces", "aliases", "kb_id", "kb_description"]
        + (["first_seen"] if with_ts else [])
    )
    fast_idents = {_ident_key(r) for r in idents_fast.collect()}

    monkeypatch.setattr(rx, "DRIVER_RESOLVE_MAX_KEYS", -1)
    keyed_slow, idents_slow, _ = rx.resolve_mentions(m, max_bucket_size=cap)
    slow = {
        (r["surface"], r["entity_type"], r["component_id"])
        for r in keyed_slow.collect()
    }
    slow_idents = {_ident_key(r) for r in idents_slow.collect()}

    assert fast == slow
    assert fast_idents == slow_idents
    # sanity: clustering happened and the KB join matched something
    assert len({c for (_, _, c) in fast}) < len(fast)
    assert any(k[7] == "Q567" for k in fast_idents)


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

"""S3 JSONL import → mentions → CDCR end-to-end."""

from __future__ import annotations

import json


def test_jsonl_to_identities(spark, tmp_path):
    from anno_spark.operators import resolve as rx
    from anno_spark.sources.jsonl import mentions_from_grounded, read_grounded_jsonl

    docs = [
        {"id": "d1", "text": "Apple Inc. in Cupertino.",
         "entities": [{"text": "Apple Inc", "entity_type": "ORG", "start": 0, "end": 9, "confidence": 0.9},
                      {"text": "Cupertino", "label": "LOC", "start": 14, "end": 23}]},
        {"id": "d2", "text": "Apple shipped.",
         "entities": [{"text": "Apple", "entity_type": "ORG", "start": 0, "end": 5, "confidence": 0.8}]},
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))

    loaded = read_grounded_jsonl(spark, str(p))
    assert loaded.count() == 2
    mentions = mentions_from_grounded(loaded)
    rows = {(r["url"], r["text"]): r for r in mentions.collect()}
    assert rows[("d1", "Cupertino")]["entity_type"] == "LOC"
    assert rows[("d1", "Cupertino")]["confidence"] == 1.0

    _, idents, _ = rx.resolve_mentions(mentions)
    by_name = {r["canonical_name"]: r for r in idents.collect()}
    # "apple" ⊂ "apple inc" → one identity for both docs
    apple = [r for r in by_name.values() if "apple" in r["canonical_name"]]
    assert len(apple) == 1 and apple[0]["n_docs"] == 2

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not available in
this environment): :func:`_decode_stub` derives deterministic fake
metadata from the bytes. The Spark-side contract — schema, batch shape,
partition-size control, UDF signature — is real and tested; swapping the
stub for PIL/libsndfile is a one-function change inside the UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, meta map<string,string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, width int, height int, "
    "duration_ms int, feature array<float>, decoder string"
)


def synthesize_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anno_spark.core.minhash import fnv1a_seeded

        kinds = ("image", "audio", "video")
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                h = fnv1a_seeded(str(i).encode(), 7)
                payload = h.to_bytes(8, "little") * (4 + i % 8)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {"source": f"synthetic/{i}", "codec": "raw"},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _decode_stub(kind: str, payload: bytes) -> dict:
    """Deterministic fake decode. Replace with PIL / soundfile / pyav in a
    real deployment — everything around this function stays unchanged."""
    from anno_spark.core.minhash import fnv1a_seeded

    h = fnv1a_seeded(payload, 3)
    if kind == "image":
        return {"width": 64 + h % 512, "height": 64 + (h >> 16) % 512, "duration_ms": 0}
    if kind == "audio":
        return {"width": 0, "height": 0, "duration_ms": 1000 + h % 60000}
    return {"width": 320 + h % 1280, "height": 240 + (h >> 8) % 720, "duration_ms": 1000 + h % 120000}


def extract_features(media: DataFrame) -> DataFrame:
    """media → per-item decoded metadata + an 8-dim feature vector.

    Real contract: Arrow batches of (media_id, kind, payload) flow into
    the Python worker; the UDF never materializes more than one batch
    (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds memory against
    large payloads — at 100 TB also set `maxPartitionBytes` down so a
    partition of blobs fits an executor).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anno_spark.core.minhash import fnv1a_seeded

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                meta = _decode_stub(kind, payload)
                feat = [
                    ((fnv1a_seeded(payload, 100 + d) % 10_000) / 10_000.0)
                    for d in range(8)
                ]
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": len(payload),
                        "width": meta["width"],
                        "height": meta["height"],
                        "duration_ms": meta["duration_ms"],
                        "feature": feat,
                        "decoder": "stub",
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def media_profile(features: DataFrame) -> DataFrame:
    """Aggregate profile per media kind (JVM-side)."""
    return features.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("duration_ms"), 2).alias("avg_duration_ms"),
    )

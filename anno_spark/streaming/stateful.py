"""Custom stateful streaming operator (applyInPandasWithState).

The batch resolver aggregates mentions into surface keys once per run
(operators/resolve.py:surface_keys).  On a continuously-crawled corpus
the same aggregation must be *incremental*: as the crawler lands new
page batches, each (surface, entity_type) key's mention count and
first-seen timestamp evolve without re-reading the history.  The
reference has no streaming runtime (its closest concept is chunked
extraction with offset shift, anno/src/lib.rs:179-195); this is the
Spark-native formulation — per-key state in the state store, updated
one Arrow batch at a time.

Semantics (exact, by construction):

* ``n_mentions``  — running SUM of mentions per key across all batches.
* ``first_seen``  — running MIN of ``warc_ts`` per key.

Both are associative+commutative, so the streaming totals after any
sequence of micro-batches equal the batch ``surface_keys`` aggregation
over the union of the inputs — the parity test pins exactly that.

State is BOUNDED per key (two scalars), so the state store grows with
the number of distinct surfaces (~10⁸ at web scale, spread across the
shuffle partitions of the state store), never with corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: running totals (first_seen as epoch-microseconds; the state
# schema is plain longs so the tuple round-trips without tz ambiguity)
STATE_SCHEMA = "n_mentions bigint, first_seen_us bigint"
OUTPUT_SCHEMA = (
    "surface string, entity_type string, n_mentions bigint, "
    "n_new bigint, first_seen timestamp"
)

_NO_TS = 2**62  # sentinel: no timestamp observed yet


def _ts_to_us(ts: Any) -> int:
    if ts is None or pd.isna(ts):
        return _NO_TS
    return int(pd.Timestamp(ts).value // 1_000)


def _update_surface_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_new = 0
    min_us = _NO_TS
    for pdf in pdfs:
        n_new += len(pdf)
        if "warc_ts" in pdf.columns and len(pdf):
            us = min(_ts_to_us(t) for t in pdf["warc_ts"])
            min_us = min(min_us, us)
    prev_n, prev_us = state.get if state.exists else (0, _NO_TS)
    total_n = prev_n + n_new
    total_us = min(prev_us, min_us)
    state.update((total_n, total_us))
    surface, entity_type = key
    yield pd.DataFrame(
        {
            "surface": [surface],
            "entity_type": [entity_type],
            "n_mentions": [total_n],
            "n_new": [n_new],
            "first_seen": [
                pd.Timestamp(total_us * 1_000) if total_us != _NO_TS else pd.NaT
            ],
        }
    )


def streaming_surface_keys(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream → per-key running (n_mentions, first_seen).

    Emits one row per key per micro-batch in which the key appeared
    (update semantics): ``n_mentions``/``first_seen`` are the running
    totals, ``n_new`` is this batch's contribution.  Downstream sinks
    upsert on (surface, entity_type).
    """
    cols = [
        F.lower(F.col("text")).alias("surface"),
        F.col("entity_type"),
    ]
    if "warc_ts" in mentions_stream.columns:
        cols.append(F.col("warc_ts"))
    keyed = mentions_stream.select(*cols)
    return keyed.groupBy("surface", "entity_type").applyInPandasWithState(
        _update_surface_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""R2 — event extraction as a Spark operator (SURVEY §2.4).

The production path is :func:`anno_spark.operators.extract.events_table`:
events are extracted inside the SAME mapInPandas pass as NER/relations/
coref (one extraction pass for the whole pipeline, VERDICT r01 fix #3)
and exploded from the ``events`` array column.

:func:`events_table` here is the STANDALONE operator (its own extraction
pass over raw pages) — kept for callers that only want events, and as the
parity oracle proving the fused path emits identical rows
(tests/test_events.py)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EVENTS_SCHEMA = (
    "url string, trigger string, trigger_start int, trigger_end int, "
    "event_type string, polarity string, tense string, confidence double, "
    "agent string, patient string"
)


def _event_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from anno_spark.core.events import extract_events_with_entities
    from anno_spark.core.stacked import extract_entities

    for pdf in batches:
        rows = []
        for url, text in zip(pdf["url"], pdf["text"]):
            text = text or ""
            ents = extract_entities(text)
            for ev in extract_events_with_entities(text, ents):
                args = dict(ev.arguments)
                rows.append(
                    {
                        "url": url,
                        "trigger": ev.trigger,
                        "trigger_start": ev.trigger_start,
                        "trigger_end": ev.trigger_end,
                        "event_type": ev.event_type,
                        "polarity": ev.polarity,
                        "tense": ev.tense,
                        "confidence": ev.confidence,
                        "agent": args.get("Agent"),
                        "patient": args.get("Patient"),
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "trigger", "trigger_start", "trigger_end", "event_type",
                "polarity", "tense", "confidence", "agent", "patient",
            ],
        )


def events_table(pages: DataFrame, text_col: str = "text") -> DataFrame:
    from pyspark.sql import functions as F

    src = pages.select("url", F.col(text_col).alias("text"))
    return src.mapInPandas(_event_batches, schema=EVENTS_SCHEMA)

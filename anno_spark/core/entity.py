"""Mention / relation data model.

Matches the reference data model (anno-core/src/entity.rs:1633-1729 for
Entity, entity.rs:2780-2852 for Relation) reduced to the fields the pipeline
needs. Offsets are Unicode *character* offsets (entity.rs:1638-1647).

Labels follow EntityType::as_label() (entity.rs:370-388):
PER ORG LOC DATE TIME MONEY PERCENT QUANTITY CARDINAL ORDINAL EMAIL URL PHONE;
Other(s) keeps its custom string (e.g. "Mention", "Hashtag", "PRON").
"""

from __future__ import annotations

from dataclasses import dataclass, field

PER = "PER"
ORG = "ORG"
LOC = "LOC"
DATE = "DATE"
TIME = "TIME"
MONEY = "MONEY"
PERCENT = "PERCENT"
EMAIL = "EMAIL"
URL = "URL"
PHONE = "PHONE"


@dataclass
class Mention:
    """One entity mention (reference: Entity / Signal)."""

    __slots__ = ("text", "entity_type", "start", "end", "confidence", "pattern", "source")

    text: str
    entity_type: str
    start: int
    end: int
    confidence: float
    pattern: str  # provenance pattern / rule name
    source: str  # backend name: "regex" | "heuristic" | ...

    def as_tuple(self):
        return (
            self.text,
            self.entity_type,
            self.start,
            self.end,
            self.confidence,
            self.pattern,
            self.source,
        )


@dataclass
class Triple:
    """One extracted relation; reference Relation::as_triple()
    (entity.rs:2833-2838) formats (head.text, relation_type, tail.text)."""

    __slots__ = (
        "subj_text",
        "subj_type",
        "subj_start",
        "subj_end",
        "pred",
        "obj_text",
        "obj_type",
        "obj_start",
        "obj_end",
        "trigger_start",
        "trigger_end",
        "confidence",
    )

    subj_text: str
    subj_type: str
    subj_start: int
    subj_end: int
    pred: str
    obj_text: str
    obj_type: str
    obj_start: int
    obj_end: int
    trigger_start: int  # -1 when absent
    trigger_end: int
    confidence: float


@dataclass
class Track:
    """Within-doc coref chain (reference grounded.rs:810-882)."""

    track_id: int
    canonical_surface: str
    entity_type: str
    signal_ids: list = field(default_factory=list)

"""Entity-list utilities: filters, sorts, position queries, grouping.

Behavioral port of the reference's EntitySliceExt trait (reference:
anno/src/types/ext.rs:30-162) over the engine's Mention lists — the
small user-facing API for post-processing extraction output inside a
UDF or driver-side.

Category predicates follow anno-core's EntityCategory mapping
(anno-core/src/entity.rs:85-103): *named* types need ML/heuristics
(PER/ORG/LOC + creative works), *structured* types are
pattern-detectable (temporal/numeric/contact).  On a mentions
DataFrame the same filters are plain ``.where`` expressions; these
helpers serve the per-document list shape.
"""

from __future__ import annotations

__all__ = [
    "NAMED_LABELS",
    "STRUCTURED_LABELS",
    "above_confidence",
    "of_type",
    "has_overlaps",
    "overlapping_pairs",
    "sorted_by_confidence",
    "sorted_by_position",
    "highest_confidence",
    "mean_confidence",
    "group_by_type",
    "contains_position",
    "at_position",
    "named_only",
    "structured_only",
]

# EntityCategory::requires_ml labels (Agent/Organization/Place/Creative)
NAMED_LABELS = frozenset(["PER", "ORG", "LOC", "GPE", "NORP", "FAC",
                          "WORK_OF_ART", "EVENT", "PRODUCT", "LAW",
                          "LANGUAGE"])
# EntityCategory::pattern_detectable labels (Temporal/Numeric/Contact)
STRUCTURED_LABELS = frozenset(["DATE", "TIME", "MONEY", "PERCENT",
                               "QUANTITY", "CARDINAL", "ORDINAL",
                               "EMAIL", "URL", "PHONE"])


def above_confidence(entities: list, minimum: float) -> list:
    return [e for e in entities if e.confidence >= minimum]


def of_type(entities: list, entity_type: str) -> list:
    return [e for e in entities if e.entity_type == entity_type]


def _overlaps(a, b) -> bool:
    # Entity::overlaps (anno-core/src/entity.rs:2031-2033)
    return not (a.end <= b.start or b.end <= a.start)


def has_overlaps(entities: list) -> bool:
    for i in range(len(entities)):
        for j in range(i + 1, len(entities)):
            if _overlaps(entities[i], entities[j]):
                return True
    return False


def overlapping_pairs(entities: list) -> list:
    return [(entities[i], entities[j])
            for i in range(len(entities))
            for j in range(i + 1, len(entities))
            if _overlaps(entities[i], entities[j])]


def sorted_by_confidence(entities: list) -> list:
    """Descending, stable (ext.rs:105-113)."""
    return sorted(entities, key=lambda e: -e.confidence)


def sorted_by_position(entities: list) -> list:
    """(start, end) ascending (ext.rs:115-119)."""
    return sorted(entities, key=lambda e: (e.start, e.end))


def highest_confidence(entities: list):
    """None when empty; ties keep the LAST maximum (Rust ``max_by``
    semantics, ext.rs:120-126)."""
    if not entities:
        return None
    best = entities[0]
    for e in entities[1:]:
        if e.confidence >= best.confidence:
            best = e
    return best


def mean_confidence(entities: list):
    if not entities:
        return None
    return sum(e.confidence for e in entities) / len(entities)


def group_by_type(entities: list) -> dict:
    groups: dict = {}
    for e in entities:
        groups.setdefault(e.entity_type, []).append(e)
    return groups


def contains_position(entities: list, pos: int) -> bool:
    return any(e.start <= pos < e.end for e in entities)


def at_position(entities: list, pos: int):
    """First entity covering ``pos`` in list order (ext.rs:151-153)."""
    for e in entities:
        if e.start <= pos < e.end:
            return e
    return None


def named_only(entities: list) -> list:
    return [e for e in entities if e.entity_type in NAMED_LABELS]


def structured_only(entities: list) -> list:
    return [e for e in entities if e.entity_type in STRUCTURED_LABELS]

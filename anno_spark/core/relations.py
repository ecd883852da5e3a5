"""R1 — pairwise trigger-pattern relation extraction (SURVEY §2.4).

Behavioral re-implementation of the reference's heuristic relation extractor
(anno/src/backends/inference.rs:2014-2073 + detect_relation_type
:2079-2163). All six relation slugs are treated as registered — this engine's
KG-construction profile registers the full pattern set.

Quirks preserved for parity:

* ordered pairs (i, j), i != j — both directions are attempted
* char distance gate <= max_span_distance (default 50, inference.rs:1991-1999)
* the between-text slice uses the entity *char* offsets as *byte* indices
  into the UTF-8 text (inference.rs:2051 `text.get(span_start..span_end)`),
  falling back to "" off char boundaries — byte == char for ASCII text
* first pattern-group hit wins, in source order; note "founded" is a CEO_OF
  trigger before FOUNDED is reached (inference.rs:2097-2128)
* type gates: employment requires head PER + tail ORG; location requires
  tail LOC (inference.rs:2139-2149)
* trigger span = byte position of the trigger within the lowercased
  between-text, offset by span_start (inference.rs:2063)

R3 — co-occurrence fallback edges (anno-core/src/graph.rs:320-382).
"""

from __future__ import annotations

from .entity import LOC, ORG, PER, Mention, Triple

MAX_SPAN_DISTANCE = 50

# (slug, triggers, confidence) in reference source order.
REL_PATTERNS = (
    ("CEO_OF", ("ceo of", "chief executive", "leads", "founded"), 0.8),
    ("WORKS_FOR", ("works for", "works at", "employed by", "employee of"), 0.7),
    ("FOUNDED", ("founded", "co-founded", "started", "established"), 0.8),
    ("LOCATED_IN", ("in", "at", "based in", "located in", "headquartered in"), 0.6),
    ("BORN_IN", ("born in", "native of", "from"), 0.7),
    ("PART_OF", ("part of", "member of", "belongs to", "subsidiary of"), 0.7),
)

_EMPLOYMENT = ("CEO_OF", "WORKS_FOR", "FOUNDED")
_LOCATION = ("LOCATED_IN", "BORN_IN")


def _byte_slice(text_bytes: bytes, start: int, end: int) -> str:
    """Rust ``text.get(start..end)`` semantics on byte indices → str or ""."""
    if start > end or end > len(text_bytes):
        return ""
    try:
        return text_bytes[start:end].decode("utf-8")
    except UnicodeDecodeError:
        return ""


# Hot-path compile of REL_PATTERNS: trigger bytes precomputed once (the
# triggers are ASCII constants, so byte length == char length), and each
# slug carries its type-gate id. Gate semantics note: in the reference,
# a trigger HIT on a type-invalid slug falls through to the next trigger
# of the same slug — which can also never return — so skipping a gated-
# out slug's triggers entirely is observationally identical (and avoids
# scanning ~half the pattern set per pair).
_GATE_EMPLOYMENT, _GATE_LOCATION, _GATE_NONE = 0, 1, 2
_REL_PATTERNS_C = tuple(
    (
        slug,
        tuple((t.encode("utf-8"), len(t)) for t in triggers),
        conf,
        _GATE_EMPLOYMENT
        if slug in _EMPLOYMENT
        else (_GATE_LOCATION if slug in _LOCATION else _GATE_NONE),
    )
    for slug, triggers, conf in REL_PATTERNS
)


def detect_relation_type(
    head: Mention, tail: Mention, between_text: str, _between_bytes: bytes | None = None
):
    """inference.rs:2079-2163 → (slug, confidence, (trig_start, trig_end)) | None.
    Trigger offsets are byte offsets into the lowercased between-text.
    ``_between_bytes`` lets a caller pass the lowercased UTF-8 bytes
    precomputed (extract_relations caches them per span)."""
    between_bytes = (
        _between_bytes
        if _between_bytes is not None
        else between_text.lower().encode("utf-8")
    )
    employment_ok = head.entity_type == PER and tail.entity_type == ORG
    location_ok = tail.entity_type == LOC
    for slug, triggers, conf, gate in _REL_PATTERNS_C:
        if gate == _GATE_EMPLOYMENT:
            if not employment_ok:
                continue
        elif gate == _GATE_LOCATION and not location_ok:
            continue
        for trig_bytes, trig_len in triggers:
            pos = between_bytes.find(trig_bytes)
            if pos != -1:
                return (slug, conf, (pos, pos + trig_len))
    return None


def extract_relations(
    entities: list[Mention], text: str, max_span_distance: int = MAX_SPAN_DISTANCE
) -> list[Triple]:
    """inference.rs:2014-2073 — all ordered pairs within the distance gate."""
    triples: list[Triple] = []
    text_bytes = text.encode("utf-8")
    n = len(entities)
    # per-doc span cache: the ordered-pair loop visits each unordered
    # span twice (i,j) and (j,i) — slice+lower+encode once per span
    span_cache: dict[tuple[int, int], bytes] = {}

    def emit(head, tail, span_start, span_end):
        between_bytes = span_cache.get((span_start, span_end))
        if between_bytes is None:
            between_bytes = (
                _byte_slice(text_bytes, span_start, span_end).lower().encode("utf-8")
            )
            span_cache[(span_start, span_end)] = between_bytes
        hit = detect_relation_type(head, tail, "", _between_bytes=between_bytes)
        if hit is None:
            return
        slug, conf, (ts, te) = hit
        triples.append(
            Triple(
                head.text, head.entity_type, head.start, head.end,
                slug,
                tail.text, tail.entity_type, tail.start, tail.end,
                span_start + ts, span_start + te, conf,
            )
        )

    # Mention-heavy pages (n ≥ 64) use a windowed scan over the
    # (start, end)-sorted list — stacked.py sorts before calling — with
    # PROVEN-skip bounds, so the quadratic loop becomes near-linear:
    # * backward prune: prefix-max(end) is nondecreasing; every j with
    #   prefix_max_end[j] < head.start - max_d has distance > max_d —
    #   bisect to the first possibly-valid j.
    # * forward break: starts nondecreasing ⇒ once a forward tail
    #   exceeds the gate, all later ones do.
    # Surviving (i, j) pairs emit in exactly the full-loop order. Short
    # pages keep the plain loop: the bookkeeping costs ~10% where a
    # 50-char gate already covers most of the page.
    if n >= 64 and all(
        (entities[k].start, entities[k].end)
        <= (entities[k + 1].start, entities[k + 1].end)
        for k in range(n - 1)
    ):
        from bisect import bisect_left

        pmax_end: list[int] = []
        running = -1
        for e in entities:
            running = e.end if e.end > running else running
            pmax_end.append(running)
        for i in range(n):
            head = entities[i]
            j0 = bisect_left(pmax_end, head.start - max_span_distance)
            for j in range(j0, n):
                if i == j:
                    continue
                tail = entities[j]
                if head.end <= tail.start:
                    if tail.start - head.end > max_span_distance:
                        break
                    emit(head, tail, head.end, tail.start)
                elif head.start - tail.end <= max_span_distance:
                    emit(head, tail, tail.end, head.start)
        return triples

    for i in range(n):
        head = entities[i]
        for j in range(n):
            if i == j:
                continue
            tail = entities[j]
            if head.end <= tail.start:
                distance = tail.start - head.end
                span_start, span_end = head.end, tail.start
            else:
                distance = max(head.start - tail.end, 0)
                span_start, span_end = tail.end, head.start
            if distance > max_span_distance:
                continue
            emit(head, tail, span_start, span_end)
    return triples


def cooccurrence_edges(entities: list[Mention], max_distance: int = 100):
    """R3 — graph.rs:320-382: all entity pairs within max_distance chars get a
    RELATED_TO edge with the distance as a property; no self-loops."""
    edges = []
    n = len(entities)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = entities[i], entities[j]
            if b.start >= a.end:
                distance = b.start - a.end
            elif a.start >= b.end:
                distance = a.start - b.end
            else:
                distance = 0
            if distance <= max_distance:
                edges.append((i, j, "RELATED_TO", distance))
    return edges

"""N4 — StackedNER layer merge (SURVEY §2.3).

Behavioral re-implementation of the reference's layered merge
(anno/src/backends/stacked.rs:545-787) with the default layer order
Regex → Heuristic (stacked.rs:537-543) and default ConflictStrategy::Priority
(stacked.rs:176-234):

* candidate spans are clamped to the text char length; invalid spans dropped
  (stacked.rs:576-597)
* overlap resolution per strategy; Priority keeps the existing entity and,
  on multi-overlap, removes all other overlapping entities except the
  best (= lowest index for Priority) — a deliberate quirk preserved here
  (stacked.rs:653-744)
* final sort by (start, end) and dedup of consecutive identical
  (start, end, entity_type), keeping the first (stacked.rs:749-762)
"""

from __future__ import annotations

from . import heuristic_ner, regex_ner
from .entity import Mention

PRIORITY = "priority"
LONGEST_SPAN = "longest_span"
HIGHEST_CONF = "highest_conf"
UNION = "union"


def _resolve(strategy: str, existing: Mention, candidate: Mention) -> str:
    """→ "keep" | "replace" | "both" (stacked.rs:203-234)."""
    if strategy == PRIORITY:
        return "keep"
    if strategy == LONGEST_SPAN:
        return "replace" if (candidate.end - candidate.start) > (existing.end - existing.start) else "keep"
    if strategy == HIGHEST_CONF:
        return "replace" if candidate.confidence > existing.confidence else "keep"
    return "both"


def _best_overlap_idx(strategy: str, entities: list[Mention], idxs: list[int]) -> int:
    """stacked.rs:659-686 — pick the existing entity to compare against.
    Rust max_by keeps the last maximal element on ties."""
    if strategy == PRIORITY:
        return min(idxs)  # comparator reverses index order
    if strategy == LONGEST_SPAN:
        best = idxs[0]
        for k in idxs[1:]:
            if (entities[k].end - entities[k].start) >= (entities[best].end - entities[best].start):
                best = k
        return best
    if strategy == HIGHEST_CONF:
        best = idxs[0]
        for k in idxs[1:]:
            if entities[k].confidence >= entities[best].confidence:
                best = k
        return best
    return max(idxs)


def merge_layers(
    layer_outputs: list[list[Mention]], text_char_count: int, strategy: str = PRIORITY
) -> list[Mention]:
    """Merge per-layer entity lists in layer order (stacked.rs:545-787)."""
    entities: list[Mention] = []
    for layer in layer_outputs:
        for cand in layer:
            start, end = cand.start, cand.end
            if end > text_char_count:
                end = text_char_count
                cand = Mention(cand.text, cand.entity_type, start, end, cand.confidence, cand.pattern, cand.source)
            if start >= end or start > text_char_count:
                continue

            overlapping = [
                k for k, e in enumerate(entities) if cand.end > e.start and cand.start < e.end
            ]
            if not overlapping:
                entities.append(cand)
            elif len(overlapping) == 1:
                k = overlapping[0]
                r = _resolve(strategy, entities[k], cand)
                if r == "replace":
                    entities[k] = cand
                elif r == "both":
                    entities.append(cand)
            else:
                if strategy == UNION:
                    entities.append(cand)
                    continue
                best = _best_overlap_idx(strategy, entities, overlapping)
                r = _resolve(strategy, entities[best], cand)
                to_remove = sorted((k for k in overlapping if k != best), reverse=True)
                if r == "keep":
                    for k in to_remove:
                        entities.pop(k)
                elif r == "replace":
                    removed_before = sum(1 for k in to_remove if k < best)
                    for k in to_remove:
                        entities.pop(k)
                    entities[best - removed_before] = cand
                else:  # both
                    for k in to_remove:
                        entities.pop(k)
                    entities.append(cand)

    entities.sort(key=lambda e: (e.start, e.end))
    if strategy != UNION:
        deduped: list[Mention] = []
        for e in entities:
            if deduped and deduped[-1].start == e.start and deduped[-1].end == e.end \
                    and deduped[-1].entity_type == e.entity_type:
                continue
            deduped.append(e)
        entities = deduped
    return entities


def extract_entities(text: str, strategy: str = PRIORITY) -> list[Mention]:
    """Default stack: RegexNER then HeuristicNER (stacked.rs:537-543)."""
    layers = [regex_ner.extract_entities(text), heuristic_ner.extract_entities(text)]
    return merge_layers(layers, len(text), strategy)

"""Inter-document entity coalescing over coref tracks (Level 2 → 3).

Port of the reference `coalesce` crate (coalesce/src/resolver.rs:1-296):
all-pairs track clustering with word-set-Jaccard string similarity
(:241-261 — NOT the tiered anno string_similarity the CDCR path uses),
falling back to normalized cosine when both tracks carry embeddings
(:280-296, cosine mapped to [0,1] via (c+1)/2), union-find, one Identity
per cluster (singletons included, :152-158), canonical = first member's
surface.

Determinism divergence carried over from core.cdcr: cluster enumeration
is by smallest member track index where the reference iterates a HashMap.

Scale note: this driver-side resolver serves the CLI's crossdoc --import
path (imported corpora are driver-sized).  The web-scale equivalent is
operators/resolve.py, which blocks with MinHash/LSH instead of the
all-pairs loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class TrackData:
    """resolver.rs:66-73 — one track flattened out of its document."""

    doc_id: str
    track_id: int
    canonical_surface: str
    entity_type: str | None = None
    cluster_confidence: float = 1.0
    embedding: list | None = None


@dataclass
class Identity:
    """anno-core Identity, reduced to the fields the resolver fills
    (resolver.rs:171-185)."""

    id: int
    canonical_name: str
    entity_type: str | None
    confidence: float
    track_refs: list = field(default_factory=list)  # [(doc_id, track_id)]
    embedding: list | None = None
    kb_id: str | None = None


def string_similarity(a: str, b: str) -> float:
    """resolver.rs:241-261 — pure word-set Jaccard; both-empty = 1.0,
    one-empty = 0.0."""
    words_a = set(a.split())
    words_b = set(b.split())
    if not words_a and not words_b:
        return 1.0
    if not words_a or not words_b:
        return 0.0
    union = len(words_a | words_b)
    return len(words_a & words_b) / union if union else 0.0


def embedding_similarity(a, b) -> float:
    """resolver.rs:280-296 — cosine mapped from [-1,1] to [0,1]."""
    if len(a) != len(b) or not a:
        return 0.0
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return (dot / (na * nb) + 1.0) / 2.0


class Resolver:
    """resolver.rs:6-224 — defaults threshold 0.7, type match on."""

    def __init__(self):
        self.similarity_threshold = 0.7
        self._require_type_match = True

    @classmethod
    def new(cls) -> "Resolver":
        return cls()

    def with_threshold(self, threshold: float) -> "Resolver":
        self.similarity_threshold = threshold
        return self

    def require_type_match(self, require: bool) -> "Resolver":
        self._require_type_match = require
        return self

    def resolve_inter_doc_coref(
        self,
        tracks,
        similarity_threshold: float | None = None,
        require_type_match: bool | None = None,
    ) -> list:
        """→ list[Identity]; embeddings preferred when both sides have
        one, else Jaccard (resolver.rs:117-142)."""
        threshold = (
            similarity_threshold
            if similarity_threshold is not None
            else self.similarity_threshold
        )
        type_match = (
            require_type_match
            if require_type_match is not None
            else self._require_type_match
        )
        tracks = list(tracks)
        if not tracks:
            return []

        parent = list(range(len(tracks)))

        def find(i: int) -> int:
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:
                parent[i], i = root, parent[i]
            return root

        for i in range(len(tracks)):
            for j in range(i + 1, len(tracks)):
                a, b = tracks[i], tracks[j]
                if type_match and a.entity_type != b.entity_type:
                    continue
                if a.embedding is not None and b.embedding is not None:
                    sim = embedding_similarity(a.embedding, b.embedding)
                else:
                    sim = string_similarity(a.canonical_surface, b.canonical_surface)
                if sim >= threshold:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[ri] = rj

        clusters: dict[int, list] = {}
        for i in range(len(tracks)):
            clusters.setdefault(find(i), []).append(i)

        identities: list[Identity] = []
        for members in sorted(clusters.values(), key=lambda m: m[0]):
            first = tracks[members[0]]
            identities.append(
                Identity(
                    id=len(identities),
                    canonical_name=first.canonical_surface,
                    entity_type=first.entity_type,
                    confidence=first.cluster_confidence,
                    track_refs=[(tracks[m].doc_id, tracks[m].track_id) for m in members],
                    embedding=list(first.embedding) if first.embedding else None,
                )
            )
        return identities

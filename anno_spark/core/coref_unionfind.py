"""C4 — library-variant within-doc coreference via union-find
(SURVEY §2.5; anno/src/backends/inference.rs:1852-1956).

Pairs (i<j) union when:
* string fast-path: lowercased exact OR substring containment AND same
  entity type (inference.rs:1884-1895); else
* char distance ≤ max_distance (default 500) AND embedding cosine ≥
  threshold (default 0.85) AND same type (inference.rs:1897-1922).

Clusters of size ≥ 2 only; representative = longest mention text
(max_by_key semantics: Rust max_by_key keeps the LAST maximal element,
preserved here). The reference's HashMap iteration makes cluster order
nondeterministic; we enumerate by smallest member index (documented
divergence, SURVEY §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from .cdcr import UnionFind
from .similarity import cosine_similarity

MAX_DISTANCE = 500
SIMILARITY_THRESHOLD = 0.85


@dataclass
class CorefCluster:
    members: list
    representative: int
    canonical_name: str


def resolve_coreferences_unionfind(
    mentions,
    embeddings=None,
    max_distance: int | None = MAX_DISTANCE,
    similarity_threshold: float = SIMILARITY_THRESHOLD,
    use_string_match: bool = True,
) -> list[CorefCluster]:
    """mentions: list[Mention]; embeddings: optional list of vectors
    aligned with mentions. → clusters (size ≥ 2)."""
    n = len(mentions)
    if n == 0:
        return []
    uf = UnionFind(n)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = mentions[i], mentions[j]
            if use_string_match:
                ta, tb = a.text.lower(), b.text.lower()
                if (ta == tb or tb in ta or ta in tb) and a.entity_type == b.entity_type:
                    uf.union(i, j)
                    continue
            if max_distance is not None:
                dist = (
                    b.start - a.end
                    if a.end <= b.start
                    else max(a.start - b.end, 0)
                )
                if dist > max_distance:
                    continue
            if embeddings is not None and j < len(embeddings):
                if (
                    cosine_similarity(embeddings[i], embeddings[j])
                    >= similarity_threshold
                    and a.entity_type == b.entity_type
                ):
                    uf.union(i, j)

    by_root: dict[int, list[int]] = {}
    for i in range(n):
        by_root.setdefault(uf.find(i), []).append(i)
    clusters = []
    for members in sorted(by_root.values(), key=lambda m: m[0]):
        if len(members) < 2:
            continue
        rep = members[0]
        for i in members:  # keep LAST maximal (Rust max_by_key tie rule)
            if len(mentions[i].text) >= len(mentions[rep].text):
                rep = i
        clusters.append(
            CorefCluster(
                members=members,
                representative=rep,
                canonical_name=mentions[rep].text,
            )
        )
    return clusters

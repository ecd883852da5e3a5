"""X3 — pair scoring (SURVEY §2.6).

string_similarity: anno/src/similarity.rs:37-92 —
1.0 exact (lowercased) → 0.8 substring containment → word-set Jaccard.
cosine_similarity: anno/src/backends/inference.rs:1960-1974.
"""

from __future__ import annotations

import math


def string_similarity(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    a_lower = a.lower()
    b_lower = b.lower()
    if a_lower == b_lower:
        return 1.0
    if b_lower in a_lower or a_lower in b_lower:
        return 0.8
    return jaccard_word_similarity(a_lower, b_lower)


def jaccard_word_similarity(a: str, b: str) -> float:
    words_a = set(a.split())
    words_b = set(b.split())
    union = len(words_a | words_b)
    if union == 0:
        return 0.0
    return len(words_a & words_b) / union


def cosine_similarity(a, b) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if na > 0.0 and nb > 0.0:
        return dot / (na * nb)
    return 0.0

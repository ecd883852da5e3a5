"""X1/X2 — MinHash signatures + LSH banding (SURVEY §2.6).

Behavioral re-implementation of the reference's LSH blocker
(anno/src/eval/cdcr.rs:265-402):

* char 3-grams of the lowercased surface; whole text if < 3 chars
  (cdcr.rs:371-381)
* 15 minhash values = 5 bands × 3 rows (cdcr.rs:288-296)
* seeded FNV-1a over UTF-8 bytes:
  hash = seed + 0xcbf29ce484222325; per byte: hash ^= b; hash *= 0x100000001b3
  (wrapping u64 arithmetic, cdcr.rs:384-392)
* band hash = fold(acc * 31 + val) over the band's rows (cdcr.rs:395-402)

Values are u64; :func:`to_i64` converts to two's-complement signed for
storage in Spark ``bigint`` columns (equality-preserving).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3

NUM_BANDS = 5
ROWS_PER_BAND = 3
NGRAM_SIZE = 3


def fnv1a_seeded(data: bytes, seed: int) -> int:
    h = (seed + _FNV_OFFSET) & _M64
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _M64
    return h


def extract_ngrams(text: str, n: int = NGRAM_SIZE) -> list[str]:
    """cdcr.rs:371-381 — char n-gram windows; whole text if too short."""
    if len(text) < n:
        return [text]
    return [text[i : i + n] for i in range(len(text) - n + 1)]


# gram → hash-vector cache: n-grams repeat massively across documents, so
# memoizing the per-gram FNV vector (as a numpy uint64 row) turns the
# signature cost from O(len·rows) hashing into dict lookups plus one
# vectorized column-min. Purely an evaluation cache — results are
# bit-identical with or without it (verified by the unit suite).
# Bounded LRU (ADVICE r01): long-lived python workers over a diverse
# corpus would otherwise grow an unevictable multi-hundred-MB dict. 64k
# entries (~20 MB) covers the surface-key use case (short repeated keys)
# where the cache actually pays; doc-granularity grams mostly miss anyway.
_GRAM_CACHE: dict = {}
_GRAM_CACHE_MAX = 65_536


def _gram_hashes(gram: str, total: int):
    import numpy as np

    key = (gram, total)
    hit = _GRAM_CACHE.get(key)
    if hit is None:
        gb = gram.encode("utf-8")
        hit = np.array([fnv1a_seeded(gb, h) for h in range(total)], dtype=np.uint64)
        if len(_GRAM_CACHE) >= _GRAM_CACHE_MAX:
            # evict oldest insertion (dicts preserve insertion order) —
            # cheap FIFO approximation of LRU, O(1), no extra structure
            _GRAM_CACHE.pop(next(iter(_GRAM_CACHE)))
        _GRAM_CACHE[key] = hit
    return hit


def compute_signature(
    text: str, num_bands: int = NUM_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> list[int]:
    """cdcr.rs:350-366 — minhash signature of the lowercased text (u64s).

    Duplicate grams are collapsed first (min over duplicates == min over
    the set); per-gram hash vectors are memoized and the row-min is one
    numpy reduction.
    """
    import numpy as np

    normalized = text.lower()
    total = num_bands * rows_per_band
    grams = set(extract_ngrams(normalized))
    if not grams:
        return [_M64] * total
    stacked = np.stack([_gram_hashes(g, total) for g in grams])
    return [int(v) for v in stacked.min(axis=0)]


def band_hashes(sig: list[int], num_bands: int = NUM_BANDS, rows_per_band: int = ROWS_PER_BAND) -> list[int]:
    """cdcr.rs:395-402 — one fold hash per band (u64s)."""
    out = []
    for band in range(num_bands):
        start = band * rows_per_band
        end = min(start + rows_per_band, len(sig))
        acc = 0
        for v in sig[start:end]:
            acc = (acc * 31 + v) & _M64
        out.append(acc)
    return out


def signature_similarity(sig1: list[int], sig2: list[int]) -> float:
    """cdcr.rs:404-414 — fraction of agreeing rows."""
    if len(sig1) != len(sig2) or not sig1:
        return 0.0
    return sum(1 for a, b in zip(sig1, sig2) if a == b) / len(sig1)


def to_i64(v: int) -> int:
    """u64 → signed 64-bit (two's complement) for Spark bigint columns."""
    return v - (1 << 64) if v >= (1 << 63) else v

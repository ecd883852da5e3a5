"""Eval-side rule-based coreference resolver (reference:
anno/src/eval/coref_resolver.rs:80-470).

The reference's evaluation harnesses (gender bias, coref metrics)
drive a deliberately simple resolver: exact canonical match →
substring/last-name fuzzy match → pronoun-to-nearest-compatible
resolution, processing entities in input order and assigning
incrementing cluster ids. Its design principle is documented at
coref_resolver.rs:222-233: gender is inferred ONLY from pronouns,
never from names — "assuming 'Mary' → female encodes bias" — and all
neopronouns (xe/ze/ey/fae families) are first-class, treated as
neutral per Cao & Daumé (2019).

This is a pure per-document function (a list of entities in, cluster
ids out); inside Spark it runs as the payload of the same
``mapInPandas`` pass the bias evaluator uses. It is NOT the engine's
production resolver (core/coref.py) — it exists so evaluations that
the reference defines **in terms of this resolver** reproduce exactly.

Determinism choice: strategy-3 fuzzy matching iterates the
canonical→cluster map (coref_resolver.rs:208-215) whose Rust HashMap
order is unspecified; the port iterates in INSERTION order (Python
dict), i.e. first-registered canonical wins ties.

Quirk preserved: the canonical map keeps ONE cluster per canonical
form — a later entity with the same canonical OVERWRITES the mapping
(HashMap::insert, coref_resolver.rs:178-180), which matters when
fuzzy matching had merged distinct canonicals into one cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

# pronoun lexicons (coref_resolver.rs:295-318, 369-396)
_MASCULINE = frozenset(("he", "him", "his", "himself"))
_FEMININE = frozenset(("she", "her", "hers", "herself"))
_NEUTRAL = frozenset((
    "they", "them", "their", "theirs", "themselves", "themself",
    "xe", "xem", "xyr", "xyrs", "xemself",
    "ze", "hir", "zir", "hirs", "zirs", "hirself", "zirself",
    "ey", "em", "eir", "eirs", "emself",
    "fae", "faer", "faers", "faeself",
))
_IMPERSONAL = frozenset(("it", "its", "itself"))
_ALL_PRONOUNS = _MASCULINE | _FEMININE | _NEUTRAL | _IMPERSONAL

_PERSON_PRONOUNS = frozenset((
    "he", "she", "they", "him", "her", "them",
    "his", "hers", "their", "theirs",
    "himself", "herself", "themselves", "themself",
    "xe", "xem", "xyr", "xyrs", "xemself",
    "ze", "hir", "zir", "hirs", "zirs", "hirself", "zirself",
    "ey", "em", "eir", "eirs", "emself",
    "fae", "faer", "faers", "faeself",
))
_ORG_PRONOUNS = frozenset(("it", "they", "its", "their", "theirs", "itself", "themselves"))
_LOC_PRONOUNS = frozenset(("it", "its", "itself"))

_TYPE_CLASS = {
    "per": "person", "person": "person",
    "org": "org", "organization": "org",
    "loc": "loc", "location": "loc", "gpe": "loc",
}


@dataclass(frozen=True)
class CorefConfig:
    """CorefConfig (coref_resolver.rs:86-106)."""

    similarity_threshold: float = 0.7
    max_pronoun_distance: int = 3
    fuzzy_matching: bool = True
    include_singletons: bool = True


def is_pronoun(text: str) -> bool:
    """coref_resolver.rs:295-318 — incl. the four neopronoun families."""
    return text.lower() in _ALL_PRONOUNS


def infer_gender(text: str) -> str | None:
    """'m'/'f'/'n'/None — pronouns ONLY, never names
    (coref_resolver.rs:369-396)."""
    lower = text.lower()
    if lower in _MASCULINE:
        return "m"
    if lower in _FEMININE:
        return "f"
    if lower in _NEUTRAL:
        return "n"
    return None


def pronoun_compatible(pronoun: str, entity_type: str) -> bool:
    """coref_resolver.rs:320-367 — persons take any personal pronoun
    incl. neopronouns; orgs take it/collective they; locations take it;
    every other type behaves like a location."""
    lower = pronoun.lower()
    cls = _TYPE_CLASS.get(entity_type.lower(), "other")
    if cls == "person":
        return lower in _PERSON_PRONOUNS
    if cls == "org":
        return lower in _ORG_PRONOUNS
    return lower in _LOC_PRONOUNS


def canonical_form(text: str, entity_type: str) -> str:
    """type-prefixed lowercase/trim (coref_resolver.rs:398-404)."""
    return f"{entity_type}:{text.lower().strip()}"


def names_match(name1: str, name2: str) -> bool:
    """Substring / last-name fuzzy match on type-prefixed canonicals
    (coref_resolver.rs:406-444)."""
    type1, _, text1 = name1.partition(":")
    type2, _, text2 = name2.partition(":")
    if type1 != type2:
        return False
    if text1 == text2:
        return True
    if text2 in text1 or text1 in text2:
        return True
    words1 = text1.split()
    words2 = text2.split()
    if len(words1) > 1 and len(words2) == 1 and words1[-1] == words2[0]:
        return True
    if len(words2) > 1 and len(words1) == 1 and words2[-1] == words1[0]:
        return True
    return False


def resolve(
    entities: list[tuple[str, str]], config: CorefConfig = CorefConfig()
) -> list[int]:
    """SimpleCorefResolver::resolve (coref_resolver.rs:143-185).

    ``entities``: [(text, entity_type)] in document order. Returns the
    cluster id per entity (incrementing from 0 in first-appearance
    order — the reference's canonical_id).
    """
    n = len(entities)
    ids: list[int | None] = [None] * n
    canonical_to_cluster: dict[str, int] = {}
    next_cluster = 0

    for i, (text, etype) in enumerate(entities):
        cluster = _find_matching_cluster(
            text, etype, entities[:i], ids, canonical_to_cluster, config
        )
        if cluster is None:
            cluster = next_cluster
            next_cluster += 1
        ids[i] = cluster
        canonical_to_cluster[canonical_form(text, etype)] = cluster
    return ids  # type: ignore[return-value]


def _find_matching_cluster(text, etype, previous, ids, canonical_map, config):
    # Strategy 1: pronoun resolution (coref_resolver.rs:200-203)
    if is_pronoun(text):
        return _resolve_pronoun(text, previous, ids, config)
    # Strategy 2: exact canonical match
    canonical = canonical_form(text, etype)
    if canonical in canonical_map:
        return canonical_map[canonical]
    # Strategy 3: substring/fuzzy (insertion-order iteration — see module doc)
    if config.fuzzy_matching:
        for other, cluster in canonical_map.items():
            if names_match(canonical, other):
                return cluster
    return None


def _resolve_pronoun(pronoun, previous, ids, config):
    """coref_resolver.rs:234-293 — nearest preceding non-pronoun,
    type-compatible, gender-compatible antecedent within
    max_pronoun_distance*10 entities."""
    pronoun_gender = infer_gender(pronoun)
    limit = config.max_pronoun_distance * 10
    for back, i in enumerate(range(len(previous) - 1, -1, -1)):
        if back >= limit:
            break
        text, etype = previous[i]
        if is_pronoun(text):
            continue
        if not pronoun_compatible(pronoun, etype):
            continue
        entity_gender = infer_gender(text)
        if pronoun_gender == "n" or entity_gender == "n":
            pass  # neutral on either side: compatible
        elif (
            pronoun_gender is not None
            and entity_gender is not None
            and pronoun_gender != entity_gender
        ):
            continue
        return ids[i]
    return None

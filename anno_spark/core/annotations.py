"""N8 — negation & quantifier tagging (SURVEY §2.3).

Reference: anno/src/cli/utils.rs:172-222. ``is_negated`` looks at the
last 3 whitespace words before the entity start for a fixed negation
list; ``detect_quantifier`` classifies the single immediately-preceding
word. Offsets are char offsets (prefix = text[:entity_start]).
"""

from __future__ import annotations

NEGATION_WORDS = frozenset(
    (
        "not", "no", "never", "none", "neither", "nor", "without",
        "isn't", "aren't", "wasn't", "weren't", "don't", "doesn't",
        "didn't", "won't", "wouldn't", "couldn't", "shouldn't",
    )
)

UNIVERSAL = "universal"
EXISTENTIAL = "existential"
NONE_Q = "none"
DEFINITE = "definite"

_QUANTIFIERS = {
    "every": UNIVERSAL, "all": UNIVERSAL, "each": UNIVERSAL, "any": UNIVERSAL,
    "some": EXISTENTIAL, "certain": EXISTENTIAL, "a": EXISTENTIAL, "an": EXISTENTIAL,
    "no": NONE_Q, "none": NONE_Q,
    "the": DEFINITE, "this": DEFINITE, "that": DEFINITE,
    "these": DEFINITE, "those": DEFINITE,
}


def is_negated(text: str, entity_start: int) -> bool:
    """utils.rs:172-205 — any of the last 3 words before the span is a
    negation word."""
    words = text[:entity_start].split()
    return any(w.lower() in NEGATION_WORDS for w in words[-3:])


def detect_quantifier(text: str, entity_start: int) -> str | None:
    """utils.rs:208-222 — classify the immediately-preceding word."""
    words = text[:entity_start].split()
    if not words:
        return None
    return _QUANTIFIERS.get(words[-1].lower())

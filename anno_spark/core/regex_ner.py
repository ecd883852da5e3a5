"""N1 — RegexNER (SURVEY §2.3).

Behavioral re-implementation of the reference's pattern NER
(anno/src/backends/regex.rs:66-371): ~25 precompiled patterns applied in a
fixed order with first-come overlap suppression (regex.rs:398-401), fixed
confidences, provenance pattern names, and a final sort by start offset
(regex.rs:368). Python ``re.finditer`` and Rust ``Regex::find_iter`` agree
on leftmost non-overlapping match semantics; offsets here are natively
character offsets (the reference converts byte→char via SpanConverter,
regex.rs:222-245 — that conversion collapses away in Python).
"""

from __future__ import annotations

import re

from .entity import DATE, EMAIL, MONEY, PERCENT, PHONE, TIME, URL, Mention

# --- pattern definitions (regex.rs:67-215), same source order ---------------

DATE_ISO = re.compile(r"\b\d{4}-\d{2}-\d{2}\b")
DATE_US = re.compile(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b")
DATE_EU = re.compile(r"\b\d{1,2}\.\d{1,2}\.\d{2,4}\b")
DATE_WRITTEN_FULL = re.compile(
    r"(?i)\b(?:January|February|March|April|May|June|July|August|September|October|November|December)\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s*\d{4})?\b"
)
DATE_WRITTEN_SHORT = re.compile(
    r"(?i)\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec)\.?\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s*\d{4})?\b"
)
DATE_WRITTEN_EU = re.compile(
    r"(?i)\b\d{1,2}(?:st|nd|rd|th)?\s+(?:January|February|March|April|May|June|July|August|September|October|November|December|Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec)\.?(?:\s+\d{4})?\b"
)
DATE_JAPANESE = re.compile(r"\d{4}年\d{1,2}月\d{1,2}日")
DATE_KOREAN = re.compile(r"\d{4}년\s*\d{1,2}월\s*\d{1,2}일")
DATE_GERMAN_FULL = re.compile(
    r"(?i)\b(?:Januar|Februar|März|April|Mai|Juni|Juli|August|September|Oktober|November|Dezember)\s+\d{1,2}(?:\.)?(?:,?\s*\d{4})?\b"
)
DATE_GERMAN_EU = re.compile(
    r"(?i)\b\d{1,2}\.?\s+(?:Januar|Februar|März|April|Mai|Juni|Juli|August|September|Oktober|November|Dezember)(?:\s+\d{4})?\b"
)
DATE_FRENCH_FULL = re.compile(
    r"(?i)\b(?:janvier|février|fevrier|mars|avril|mai|juin|juillet|août|aout|septembre|octobre|novembre|décembre|decembre)\s+\d{1,2}(?:,?\s*\d{4})?\b"
)
DATE_FRENCH_EU = re.compile(
    r"(?i)\b\d{1,2}(?:er)?\s+(?:janvier|février|fevrier|mars|avril|mai|juin|juillet|août|aout|septembre|octobre|novembre|décembre|decembre)(?:\s+\d{4})?\b"
)
DATE_SPANISH_EU = re.compile(
    r"(?i)\b\d{1,2}\s+(?:de\s+)?(?:enero|febrero|marzo|abril|mayo|junio|julio|agosto|septiembre|octubre|noviembre|diciembre)(?:\s+(?:de\s+)?\d{4})?\b"
)
DATE_ITALIAN_EU = re.compile(
    r"(?i)\b\d{1,2}\s+(?:gennaio|febbraio|marzo|aprile|maggio|giugno|luglio|agosto|settembre|ottobre|novembre|dicembre)(?:\s+\d{4})?\b"
)
DATE_PORTUGUESE_EU = re.compile(
    r"(?i)\b\d{1,2}\s+(?:de\s+)?(?:janeiro|fevereiro|março|marco|abril|maio|junho|julho|agosto|setembro|outubro|novembro|dezembro)(?:\s+(?:de\s+)?\d{4})?\b"
)
DATE_DUTCH_EU = re.compile(
    r"(?i)\b\d{1,2}\s+(?:januari|februari|maart|april|mei|juni|juli|augustus|september|oktober|november|december)(?:\s+\d{4})?\b"
)
DATE_RUSSIAN_EU = re.compile(
    r"\b\d{1,2}\s+(?:января|февраля|марта|апреля|мая|июня|июля|августа|сентября|октября|ноября|декабря)(?:\s+\d{4})?\b"
)
TIME_12H = re.compile(r"(?i)\b\d{1,2}:\d{2}(?::\d{2})?\s*(?:am|pm|a\.m\.|p\.m\.)\b")
TIME_24H = re.compile(r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?::[0-5]\d)?\b")
TIME_SIMPLE = re.compile(r"(?i)\b\d{1,2}\s*(?:am\b|pm\b|a\.m\.|p\.m\.)")
MONEY_SYMBOL = re.compile(
    r"[$€£¥][\d,]+(?:\.\d{1,2})?(?:\s*(?:billion|million|thousand|B|M|K|bn|mn))?"
)
MONEY_WRITTEN = re.compile(
    r"(?i)\b\d+(?:,\d{3})*(?:\.\d{1,2})?\s*(?:dollars?|USD|euros?|EUR|pounds?|GBP|yen|JPY)\b"
)
MONEY_MAGNITUDE = re.compile(
    r"(?i)\b\d+(?:\.\d+)?\s*(?:billion|million|trillion)\s*(?:dollars?|euros?|pounds?)?\b"
)
PERCENT_RE = re.compile(r"\b\d+(?:\.\d+)?\s*(?:%|percent\b|pct\b)")
EMAIL_RE = re.compile(r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b")
URL_RE = re.compile(r"(?i)\bhttps?://[^\s<>\[\]{}|\\^`\x00-\x1f]+")
PHONE_US = re.compile(r"(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b")
PHONE_INTL = re.compile(r"\+\d{1,3}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,9}\b")
MENTION_RE = re.compile(r"\B@[\w](?:[\w.]*[\w])?")
HASHTAG_RE = re.compile(r"\B#\w+")

# (pattern, entity_type, confidence, provenance name) in reference
# application order (regex.rs:252-364) — order defines overlap priority.
_PASSES = (
    (DATE_ISO, DATE, 0.95, "DATE_ISO"),
    (DATE_US, DATE, 0.95, "DATE_US"),
    (DATE_EU, DATE, 0.95, "DATE_EU"),
    (DATE_WRITTEN_FULL, DATE, 0.95, "DATE_WRITTEN_FULL"),
    (DATE_WRITTEN_SHORT, DATE, 0.95, "DATE_WRITTEN_SHORT"),
    (DATE_WRITTEN_EU, DATE, 0.95, "DATE_WRITTEN_EU"),
    (DATE_JAPANESE, DATE, 0.93, "DATE_JAPANESE"),
    (DATE_KOREAN, DATE, 0.93, "DATE_KOREAN"),
    (DATE_GERMAN_FULL, DATE, 0.93, "DATE_GERMAN_FULL"),
    (DATE_GERMAN_EU, DATE, 0.93, "DATE_GERMAN_EU"),
    (DATE_FRENCH_FULL, DATE, 0.93, "DATE_FRENCH_FULL"),
    (DATE_FRENCH_EU, DATE, 0.93, "DATE_FRENCH_EU"),
    (DATE_SPANISH_EU, DATE, 0.93, "DATE_SPANISH_EU"),
    (DATE_ITALIAN_EU, DATE, 0.93, "DATE_ITALIAN_EU"),
    (DATE_PORTUGUESE_EU, DATE, 0.93, "DATE_PORTUGUESE_EU"),
    (DATE_DUTCH_EU, DATE, 0.93, "DATE_DUTCH_EU"),
    (DATE_RUSSIAN_EU, DATE, 0.93, "DATE_RUSSIAN_EU"),
    (TIME_12H, TIME, 0.90, "TIME_12H"),
    (TIME_24H, TIME, 0.90, "TIME_24H"),
    (TIME_SIMPLE, TIME, 0.90, "TIME_SIMPLE"),
    (MONEY_SYMBOL, MONEY, 0.95, "MONEY_SYMBOL"),
    (MONEY_WRITTEN, MONEY, 0.95, "MONEY_WRITTEN"),
    (MONEY_MAGNITUDE, MONEY, 0.95, "MONEY_MAGNITUDE"),
    (PERCENT_RE, PERCENT, 0.95, "PERCENT"),
    (EMAIL_RE, EMAIL, 0.98, "EMAIL"),
    (URL_RE, URL, 0.98, "URL"),
    (PHONE_US, PHONE, 0.85, "PHONE_US"),
    (PHONE_INTL, PHONE, 0.85, "PHONE_INTL"),
    (MENTION_RE, "Mention", 0.95, "MENTION"),
    (HASHTAG_RE, "Hashtag", 0.95, "HASHTAG"),
)


def _overlaps(entities: list[Mention], start: int, end: int) -> bool:
    """regex.rs:398-401 — any span overlap."""
    return any(not (end <= e.start or start >= e.end) for e in entities)


_DIGIT_RE = re.compile(r"\d")

# Cheap pre-scan guards (hot path: ~30 full-text regex scans per page).
# Each entry lists constants the pattern REQUIRES to match — strictly
# implied by the pattern source above, so skipping a guarded-out pass is
# observationally identical. "d" = any \d digit (same \d the patterns
# use); plain strings are substring checks; the second tuple is
# any-of-these-substrings. Patterns without a safe guard get (("d",), ()).
_G_DIGIT = (("d",), ())
_GUARDS = {
    "DATE_ISO": (("d", "-"), ()),
    "DATE_US": (("d", "/"), ()),
    "DATE_EU": (("d", "."), ()),
    "DATE_JAPANESE": (("d", "年"), ()),
    "DATE_KOREAN": (("d", "년"), ()),
    "TIME_12H": (("d", ":"), ()),
    "TIME_24H": (("d", ":"), ()),
    "MONEY_SYMBOL": ((), ("$", "€", "£", "¥")),
    "EMAIL": (("@",), ()),
    "URL": (("://",), ()),
    "PHONE_INTL": (("d", "+"), ()),
    "MENTION": (("@",), ()),
    "HASHTAG": (("#",), ()),
}


def extract_entities(text: str) -> list[Mention]:
    """Run all patterns in order with first-come overlap suppression;
    output sorted by start (regex.rs:368)."""
    entities: list[Mention] = []
    has_digit = _DIGIT_RE.search(text) is not None
    for pattern, etype, conf, name in _PASSES:
        all_of, any_of = _GUARDS.get(name, _G_DIGIT)
        skip = False
        for g in all_of:
            if (not has_digit) if g == "d" else (g not in text):
                skip = True
                break
        if skip or (any_of and not any(s in text for s in any_of)):
            continue
        for m in pattern.finditer(text):
            s, e = m.start(), m.end()
            if not _overlaps(entities, s, e):
                entities.append(Mention(m.group(), etype, s, e, conf, name, "regex"))
    entities.sort(key=lambda e: e.start)
    return entities

"""N2/N3 — HeuristicNER (SURVEY §2.3).

Behavioral re-implementation of the reference's capitalization-driven span
builder + minimal classifier (anno/src/backends/heuristic.rs:294-754):

* CJK substring gazetteer scan when the text contains CJK chars
  (heuristic.rs:304-375), confidence 0.9, dedup by exact span
* linear whitespace word scan with char positions (heuristic.rs:380-408)
* skip COMMON_SENTENCE_STARTERS as span heads (heuristic.rs:103-158, 424-429)
* grow spans over capitalized words; connectors only "of"/"the"
  (heuristic.rs:463); break at `.!?)]}`-terminated words unless the next
  word is an ORG_SUFFIX (heuristic.rs:449-507)
* attach PERSON_PREFIX (mr/ms/mrs/dr/prof) from the previous word
  (heuristic.rs:519-567); in that branch punctuation is NOT stripped
* otherwise strip leading/trailing punctuation — note the reference adds the
  *byte* length of stripped leading punctuation to the char start
  (heuristic.rs:570-587); we preserve that quirk for parity
* classify_minimal (heuristic.rs:650-754), confidence threshold 0.35
  (heuristic.rs:24-28); Other("skip") results are dropped
"""

from __future__ import annotations

from .entity import LOC, ORG, PER, Mention
from .textops import _WHITE_SPACE

THRESHOLD = 0.35

ORG_SUFFIX = frozenset((
    "inc.", "inc", "corp.", "corp", "ltd.", "ltd", "llc", "co.", "plc",
    "foundation", "institute", "university", "college", "bank", "group",
    "agency",
    "gmbh", "ag", "kg", "sa", "s.a.", "s.l.", "s.r.l.", "spa", "nv", "bv",
    "pty", "ab", "limited", "corporation", "incorporated", "company",
    "holding", "holdings",
))

PERSON_PREFIX = frozenset(("mr.", "mr", "ms.", "ms", "mrs.", "mrs", "dr.", "dr", "prof.", "prof"))

LOC_PREPOSITION = frozenset((
    "in", "from", "at", "to", "near",
    "aus", "nach", "bei", "von",
    "en", "de", "à", "dans", "por", "sur",
))

SKIP_WORDS = frozenset(("ceo", "cto", "cfo", "vp", "president", "chairman", "director"))

COMMON_SENTENCE_STARTERS = frozenset((
    "the", "a", "an", "this", "that", "these", "those", "it", "he", "she",
    "we", "they", "in", "on", "at", "to", "for", "from", "by", "with",
    "and", "but", "or", "so", "yet", "if", "because", "contact", "call",
    "email", "visit", "please", "see", "note", "today", "yesterday",
    "tomorrow", "now", "then", "what", "where", "when", "who", "why",
    "how", "is", "are", "was", "were", "be", "been", "have", "has", "had",
))

# Gazetteers (heuristic.rs:163-292) — list order matters for the CJK scan.
KNOWN_ORGS = (
    "google", "apple", "microsoft", "amazon", "facebook", "meta", "tesla",
    "twitter", "ibm", "intel", "nvidia", "oracle", "cisco", "samsung",
    "sony", "toyota", "honda", "bmw", "mercedes", "volkswagen", "nasa",
    "fbi", "cia", "nsa", "nato", "un", "eu", "bbc", "cnn", "nbc", "cbs",
    "abc", "fox", "nyt", "wsj", "reuters", "bloomberg", "spotify",
    "netflix", "uber", "airbnb", "paypal", "visa", "mastercard", "amex",
    "ソニー", "トヨタ", "ホンダ", "任天堂", "サムスン", "ファーウェイ",
    "アリババ", "テンセント", "华为", "阿里巴巴", "腾讯", "百度", "小米",
)
KNOWN_ORGS_SET = frozenset(KNOWN_ORGS)

KNOWN_LOCS = (
    "paris", "london", "tokyo", "berlin", "rome", "madrid", "moscow",
    "beijing", "shanghai", "dubai", "singapore", "sydney", "toronto",
    "chicago", "boston", "california", "texas", "florida", "new york",
    "washington", "europe", "asia", "africa", "america", "australia",
    "china", "india", "japan", "germany", "france", "italy", "spain",
    "brazil", "mexico", "russia", "korea", "canada", "uk", "usa",
    "東京", "大阪", "京都", "北京", "上海", "香港", "ソウル", "台北",
    "中国", "日本", "韓国", "アメリカ", "イギリス", "フランス", "ドイツ",
)
KNOWN_LOCS_SET = frozenset(KNOWN_LOCS)

KNOWN_PERSONS = frozenset((
    "john", "jane", "mary", "james", "robert", "michael", "william",
    "david", "richard", "joseph", "thomas", "charles", "barack", "donald",
    "joe", "george", "bill", "vladimir", "emmanuel", "boris", "narendra",
    "justin", "elon", "jeff", "mark", "steve", "tim", "satya", "sundar",
    "albert", "isaac", "stephen", "neil", "peter", "paul", "matthew",
    "andrew", "philip", "simon", "marie", "angela", "hillary", "nancy",
    "kamala", "michelle", "melania", "jill", "theresa", "ursula",
))

_SKIP_PRONOUNS = frozenset(("the", "a", "an", "he", "she", "it", "they", "we", "i", "you"))
_PLACE_INDICATORS = frozenset(("united", "new", "south", "north", "west", "east", "great"))


def _is_alnum(c: str) -> bool:
    # Rust char::is_alphanumeric = is_alphabetic || is_numeric; Python's
    # str.isalnum() covers the same categories for practical inputs.
    return c.isalnum()


def _lstrip_na(s: str) -> str:
    if s and s[0].isalnum():  # fast path: most words start alphanumeric
        return s
    i = 0
    while i < len(s) and not s[i].isalnum():
        i += 1
    return s[i:]


def _rstrip_na(s: str) -> str:
    if s and s[-1].isalnum():  # fast path: most words end alphanumeric
        return s
    j = len(s)
    while j > 0 and not s[j - 1].isalnum():
        j -= 1
    return s[:j]


def _strip_na(s: str) -> str:
    return _rstrip_na(_lstrip_na(s))


def _is_cjk_char(c: str) -> bool:
    o = ord(c)
    return 0x4E00 <= o <= 0x9FFF or 0x3040 <= o <= 0x309F or 0x30A0 <= o <= 0x30FF


# C-speed equivalents of the per-char Python scans (hot path: these run
# over the FULL text of every page). Semantics identical by construction:
# the regex classes are built from the same ranges / the same
# _WHITE_SPACE character set.
import re as _re

_CJK_RE = _re.compile("[\u4e00-\u9fff\u3040-\u309f\u30a0-\u30ff]")
_NONWS_RE = _re.compile("[^" + _re.escape("".join(sorted(_WHITE_SPACE))) + "]+")


def _first_upper(s: str) -> bool:
    return bool(s) and s[0].isupper()


def classify_minimal(span: list[str], all_words: list[str], start_idx: int):
    """heuristic.rs:650-754 — rule cascade → (entity_type, confidence, reason)."""
    last_word = span[-1].lower() if span else ""
    first_word = span[0].lower() if span else ""
    span_lower = " ".join(w.lower() for w in span)
    prev_word = all_words[start_idx - 1].lower() if start_idx > 0 else None

    if len(span) == 1 and first_word in _SKIP_PRONOUNS:
        return ("skip", 0.0, "skip_pronoun")
    first_clean_lc = _rstrip_na(first_word)
    if len(span) == 1 and first_clean_lc in SKIP_WORDS:
        return ("skip", 0.0, "skip_word")

    last_clean = _rstrip_na(last_word)
    if last_clean in ORG_SUFFIX:
        return (ORG, 0.85, "org_suffix")

    first_clean_text = _rstrip_na(first_word)
    if first_clean_text in KNOWN_ORGS_SET or span_lower in KNOWN_ORGS_SET:
        return (ORG, 0.80, "known_org")
    if first_clean_text in KNOWN_LOCS_SET or span_lower in KNOWN_LOCS_SET:
        return (LOC, 0.80, "known_location")
    if first_clean_text in KNOWN_PERSONS:
        return (PER, 0.75, "common_name")

    if prev_word is not None and prev_word.rstrip(".") in PERSON_PREFIX:
        return (PER, 0.80, "person_prefix_context")
    if first_word.rstrip(".") in PERSON_PREFIX and len(span) >= 2:
        return (PER, 0.75, "person_prefix_span")
    if prev_word is not None and prev_word in LOC_PREPOSITION:
        return (LOC, 0.70, "loc_context")

    if len(span) == 2:
        if first_word in _PLACE_INDICATORS:
            return (LOC, 0.65, "loc_indicator")
        return (PER, 0.60, "two_word_name")

    if len(span) >= 3:
        if span[1].lower() == "of":
            return (ORG, 0.65, "org_of_pattern")
        return (ORG, 0.50, "long_span_org")

    if start_idx == 0 and prev_word is None:
        return (PER, 0.30, "single_start_word")
    return (PER, 0.45, "capitalized")


def _cjk_gazetteer_scan(text: str, entities: list[Mention]):
    """heuristic.rs:304-375 — substring scan for CJK gazetteer entries."""
    for gaz, etype in ((KNOWN_ORGS, ORG), (KNOWN_LOCS, LOC)):
        for term in gaz:
            if not any(ord(c) >= 0x3040 for c in term):
                continue
            tlen = len(term)
            pos = text.find(term)
            while pos != -1:
                s, e = pos, pos + tlen
                if not any(x.start == s and x.end == e for x in entities):
                    entities.append(Mention(term, etype, s, e, 0.9, "cjk_gazetteer", "heuristic"))
                pos = text.find(term, pos + tlen)


def extract_entities(text: str, threshold: float = THRESHOLD) -> list[Mention]:
    if not text:
        return []
    entities: list[Mention] = []

    if _CJK_RE.search(text) is not None:  # ≡ any(_is_cjk_char(c) for c in text)
        _cjk_gazetteer_scan(text, entities)

    # Whitespace word scan with char positions (heuristic.rs:380-408):
    # runs of non-_WHITE_SPACE chars, found at C speed (the regex class
    # is built from the exact same character set).
    words_with_pos: list[tuple[str, int, int]] = [
        (m.group(), m.start(), m.end()) for m in _NONWS_RE.finditer(text)
    ]

    words = [w for (w, _, _) in words_with_pos]
    nwords = len(words)

    i = 0
    while i < nwords:
        word = words[i]
        clean_leading = _lstrip_na(word)
        if not clean_leading or not clean_leading[0].isupper():
            i += 1
            continue

        start_idx = i
        first_word_clean = _strip_na(word.lower())
        if first_word_clean in COMMON_SENTENCE_STARTERS:
            i += 1
            continue

        # Grow the span (heuristic.rs:449-507).
        while i < nwords:
            w = words[i]
            w_clean = _lstrip_na(w)
            ends_with_closing = w.endswith((")", "]", "}"))
            ends_with_punct = w.endswith((".", "!", "?"))
            first_char_upper = _first_upper(w_clean)
            is_connector = w.lower() in ("of", "the")

            if i + 1 < nwords:
                nxt = words[i + 1]
                nxt_clean = _lstrip_na(nxt)
                nxt_upper = _first_upper(nxt_clean)
                is_suffix = nxt_clean.lower() in ORG_SUFFIX
                if (ends_with_closing or ends_with_punct) and not is_suffix:
                    next_word_ok = False
                else:
                    next_word_ok = nxt_upper
            else:
                next_word_ok = False

            if first_char_upper or (is_connector and next_word_ok):
                i += 1
                if ends_with_closing or ends_with_punct:
                    if i < nwords:
                        is_suffix_next = _strip_na(words[i].lower()) in ORG_SUFFIX
                    else:
                        is_suffix_next = False
                    if not is_suffix_next:
                        break
            else:
                break
        end_idx = i

        if start_idx == end_idx:
            continue  # unreachable in practice (first word always advances)

        span_words = words[start_idx:end_idx]
        entity_text = " ".join(span_words)

        prev_word = words[start_idx - 1].lower().rstrip(".") if start_idx > 0 else None
        if prev_word is not None and prev_word in PERSON_PREFIX:
            # Prefix branch (heuristic.rs:519-567): no punctuation cleaning.
            prefix_word = words[start_idx - 1]
            entity_text = f"{prefix_word} {entity_text}"
            char_start = words_with_pos[start_idx - 1][1]
            char_end = char_start + len(entity_text)
            clean_span_words = entity_text.split()
            etype, conf, reason = classify_minimal(clean_span_words, words, start_idx - 1)
            if conf >= threshold and etype not in ("skip",):
                entities.append(
                    Mention(entity_text, etype, char_start, char_end, conf, reason, "heuristic")
                )
            continue

        # Strip leading punctuation; the reference adds its BYTE length to the
        # char start (heuristic.rs:570-578) — preserved for parity.
        stripped = _lstrip_na(entity_text)
        lp_chars = len(entity_text) - len(stripped)
        lp_bytes = len(entity_text[:lp_chars].encode("utf-8"))
        entity_text = stripped
        while entity_text and not _is_alnum(entity_text[-1]):
            entity_text = entity_text[:-1]
        if not entity_text:
            continue

        char_start = words_with_pos[start_idx][1] + lp_bytes
        char_end = char_start + len(entity_text)

        clean_span_words = entity_text.split()
        etype, conf, reason = classify_minimal(clean_span_words, words, start_idx)
        if conf >= threshold and etype not in ("skip",):
            entities.append(
                Mention(entity_text, etype, char_start, char_end, conf, reason, "heuristic")
            )

    return entities

"""Text extraction & normalization (SURVEY §2.2).

T1: extract_text_from_html — behavioral re-implementation of the reference's
single-pass HTML state machine (anno/src/ingest/url_resolver.rs:45-170).
This is the byte-identical invariant surface: for every url, our output must
equal the reference extractor's output byte-for-byte. The sharp edges are
deliberately preserved:

* tag scan consumes through ``>``; tag-name stops at the first whitespace
  (url_resolver.rs:66-85); script/style toggling compares the lowercased
  tag name to exactly "script"/"/script"/"style"/"/style"
* a space is inserted after *opening* block tags (p div br li h1-h6) only —
  closing tags like ``/p`` do not match the list (url_resolver.rs:88-98) —
  and only when the buffer is non-empty and not already space-terminated
* only the fixed named-entity set and *decimal* numeric entities decode;
  hex entities and unknown entities are kept verbatim
  (url_resolver.rs:121-160)
* the entity scan consumes up to ``;``, whitespace, or ``<`` — the
  terminator is consumed into the buffer and echoed for invalid entities
  (url_resolver.rs:111-120, 151-155)
* final cleanup: split lines on \n (\r\n tolerant), trim Unicode
  whitespace, drop empties, join with "\n" (url_resolver.rs:163-168)

T2: preprocess — document preprocessor (anno/src/ingest/preprocessor.rs:60-129).
OFF on the golden path (extract.rs:118-133 runs it only with --clean).

T3: detect_language — Unicode-script counting with weighted diacritics
(anno/src/lang.rs:54-120).
"""

from __future__ import annotations

# Unicode White_Space property, matching Rust char::is_whitespace /
# str::trim. NOTE: Python's str.isspace()/strip() additionally treat
# U+001C-001F as whitespace, so we use this explicit set instead.
_WHITE_SPACE = frozenset(
    "\t\n\x0b\x0c\r \x85\xa0 "
    "           "
    "    　"
)

_BLOCK_TAGS = frozenset(("p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6"))

_NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
    "&nbsp;": " ",
    "&#39;": "'",
    "&#8217;": "’",
    "&#8220;": "“",
    "&#8221;": "”",
}


def _is_ws(c: str) -> bool:
    return c in _WHITE_SPACE


def _trim_ws(s: str) -> str:
    start = 0
    end = len(s)
    while start < end and s[start] in _WHITE_SPACE:
        start += 1
    while end > start and s[end - 1] in _WHITE_SPACE:
        end -= 1
    return s[start:end]


def _parse_u32(s: str):
    """Rust ``str::parse::<u32>``: optional '+', then ASCII digits, <= u32 max."""
    if not s:
        return None
    if s[0] == "+":
        s = s[1:]
        if not s:
            return None
    if not all("0" <= c <= "9" for c in s):
        return None
    v = int(s)
    return v if v <= 0xFFFFFFFF else None


def extract_text_from_html(html: str) -> str:
    """Single-pass HTML → text (url_resolver.rs:45-170). See module doc."""
    out: list[str] = []
    out_len = 0  # chars appended so far (for the "non-empty" check)
    last_char = ""  # to check ends_with(' ')
    in_script = False
    in_style = False
    i = 0
    n = len(html)

    def push(s: str):
        nonlocal out_len, last_char
        if s:
            out.append(s)
            out_len += len(s)
            last_char = s[-1]

    while i < n:
        ch = html[i]
        if ch == "<":
            i += 1
            tag_name: list[str] = []
            in_tag_name = True
            while i < n:
                c = html[i]
                if c == ">":
                    i += 1
                    tl = "".join(tag_name).lower()
                    # tag_name never contains whitespace, so the reference's
                    # starts_with("script ") etc. branches are unreachable.
                    if tl == "script":
                        in_script = True
                    elif tl == "/script":
                        in_script = False
                    elif tl == "style":
                        in_style = True
                    elif tl == "/style":
                        in_style = False
                    break
                if _is_ws(c):
                    in_tag_name = False
                    i += 1
                elif in_tag_name:
                    tag_name.append(c)
                    i += 1
                else:
                    i += 1
            # Space after opening block tags (runs even if tag unclosed @ EOF,
            # matching the reference's post-loop check).
            if not in_script and not in_style:
                if "".join(tag_name).lower() in _BLOCK_TAGS:
                    if out_len and last_char != " ":
                        push(" ")
        elif in_script or in_style:
            i += 1
        elif ch == "&":
            entity = ["&"]
            i += 1
            found_semicolon = False
            while i < n:
                c = html[i]
                entity.append(c)
                i += 1
                if c == ";":
                    found_semicolon = True
                    break
                if _is_ws(c) or c == "<":
                    break
            ent = "".join(entity)
            if found_semicolon:
                decoded = _NAMED_ENTITIES.get(ent)
                if decoded is not None:
                    push(decoded)
                elif ent.startswith("&#") and len(ent) > 3 - 1:  # len(">2" in bytes) == >2 chars here
                    num = _parse_u32(ent[2:-1])
                    cp = None
                    if num is not None and num <= 0x10FFFF and not (0xD800 <= num <= 0xDFFF):
                        cp = chr(num)
                    if cp is not None:
                        push(cp)
                    else:
                        push(ent)  # unknown entity kept verbatim
                else:
                    push(ent)
            else:
                # Not a valid entity: '&' + consumed chars echoed verbatim
                # (terminator included — url_resolver.rs:151-155).
                push(ent)
        else:
            push(ch)
            i += 1

    text = "".join(out)
    # Rust str::lines(): split on '\n', strip one trailing '\r' per line.
    lines = []
    for line in text.split("\n"):
        if line.endswith("\r"):
            line = line[:-1]
        line = _trim_ws(line)
        if line:
            lines.append(line)
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# T2 — document preprocessor (preprocessor.rs:60-129). Golden path: OFF.
# ---------------------------------------------------------------------------

_ZERO_WIDTH = ("​", "‌", "‍", "﻿")


def normalize_unicode_basic(text: str) -> str:
    """preprocessor.rs:74-86 — the ``normalize_unicode`` flag: strip the
    four zero-width characters (U+200B/200C/200D/FEFF). The reference
    does "basic normalization without external crate", i.e. exactly
    this filter, not full NFC."""
    for z in _ZERO_WIDTH:
        text = text.replace(z, "")
    return text


def clean_whitespace(text: str) -> str:
    """preprocessor.rs:88-119 — the ``clean_whitespace`` flag: CRLF and
    bare CR → LF, then collapse every whitespace run to a single char
    ('\\n' when the run's first char is a newline, else ' '; a later
    newline in a run only survives if nothing newline-ish was emitted
    yet — the reference's exact loop), then trim."""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    out: list[str] = []
    last_was_space = False
    for c in text:
        if c in _WHITE_SPACE:
            if not last_was_space:
                out.append("\n" if c == "\n" else " ")
                last_was_space = True
            elif c == "\n" and (not out or out[-1] != "\n"):
                out.append("\n")
        else:
            out.append(c)
            last_was_space = False
    # Rust str::trim — char::is_whitespace at both ends
    s, e = 0, len(out)
    while s < e and out[s] in _WHITE_SPACE:
        s += 1
    while e > s and out[e - 1] in _WHITE_SPACE:
        e -= 1
    return "".join(out[s:e])


def prepare(text: str, clean: bool = False, normalize: bool = False) -> str:
    """DocumentPreprocessor::prepare (preprocessor.rs:60-129) for the
    extract-command flags (extract.rs:118-133): ``normalize`` (unicode)
    runs first, then ``clean`` (whitespace). Both default off — the
    golden extraction path is byte-identical to the raw text."""
    if normalize:
        text = normalize_unicode_basic(text)
    if clean:
        text = clean_whitespace(text)
    return text


def preprocess(text: str) -> str:
    """Remove zero-width chars, CRLF→LF, collapse intra-line whitespace runs
    to one space preserving newlines / paragraph breaks, trim."""
    for z in _ZERO_WIDTH:
        text = text.replace(z, "")
    text = text.replace("\r\n", "\n")
    out: list[str] = []
    pending_nl = 0
    pending_sp = False
    for c in text:
        if c == "\n":
            pending_nl += 1
            pending_sp = False
        elif c in _WHITE_SPACE:
            pending_sp = True
        else:
            if pending_nl:
                out.append("\n" if pending_nl == 1 else "\n\n")
                pending_nl = 0
            elif pending_sp and out:
                out.append(" ")
            pending_sp = False
            out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# T3 — language detection (lang.rs:54-120)
# ---------------------------------------------------------------------------

# Index order = reference Language enum discriminants (lang.rs:5-31).
_LANGS = ("en", "de", "fr", "es", "it", "pt", "ru", "zh", "ja", "ko", "ar", "he", "other")
_EN, _DE, _FR, _ES, _IT, _PT, _RU, _ZH, _JA, _KO, _AR, _HE, _OTHER = range(13)

_GERMAN_CHARS = frozenset("ßäöüÄÖÜ")
_FRENCH_CHARS = frozenset("àâçéèêëîïôûù")
_SPANISH_CHARS = frozenset("ñ¿¡áíóú")  # ¿ ¡ are non-alphabetic → dead, kept for parity


def detect_language(text: str) -> str:
    """Heuristic Unicode-script language detection; returns an ISO-ish code."""
    counts = [0] * 13
    total = 0
    for c in text:
        if not c.isalpha():
            continue
        total += 1
        o = ord(c)
        if 0x4E00 <= o <= 0x9FFF:
            counts[_ZH] += 1
        elif 0x3040 <= o <= 0x30FF:
            counts[_JA] += 1
        elif 0xAC00 <= o <= 0xD7AF:
            counts[_KO] += 1
        elif 0x0600 <= o <= 0x06FF:
            counts[_AR] += 1
        elif 0x0590 <= o <= 0x05FF:
            counts[_HE] += 1
        elif 0x0400 <= o <= 0x04FF:
            counts[_RU] += 1
        elif ("a" <= c <= "z") or ("A" <= c <= "Z"):
            counts[_EN] += 1
        elif c in _GERMAN_CHARS:
            counts[_DE] += 10
        elif c in _FRENCH_CHARS:
            counts[_FR] += 5
        elif c in _SPANISH_CHARS:
            counts[_ES] += 5
    if total == 0:
        return _LANGS[_EN]
    max_idx = 0
    max_val = 0
    for idx, val in enumerate(counts):
        if val > max_val:
            max_val = val
            max_idx = idx
    # Han + kana → Japanese (lang.rs:111-114)
    if max_idx == _ZH and counts[_JA] > 0:
        return _LANGS[_JA]
    return _LANGS[max_idx]

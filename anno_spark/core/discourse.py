"""Discourse-scope analysis: referent types, shell nouns, clause/sentence
segmentation, and event coreference (reference:
anno/src/discourse/types.rs:65-1131).

Abstract anaphora ("Russia invaded Ukraine. **This** shocked the
world.") refers to events/facts/propositions rather than entities. The
machinery here supports resolving those: a referent-type taxonomy
(types.rs:65-133), Schmid-2000 shell-noun classes with a ~100-lemma
lexicon (:462-643), heuristic sentence/clause boundary detection with
candidate-antecedent span generation (DiscourseScope, :644-853), and a
greedy trigger/argument event-coreference resolver (:955-1131).

All of it is per-document pure-python — it runs inside the engine's
``mapInPandas`` extraction tasks (the same contract as core/textops,
core/coref), so there is no driver-side state and it distributes with
the documents.

Byte↔char: the reference mixes char indices with byte offsets in
boundary detection (find_sentence_boundaries, :675-709 computes a
byte offset from a char loop); Python strings are char-indexed, so the
distinction collapses (SURVEY T4) — offsets here are char offsets
throughout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# referent types (types.rs:65-133)

REFERENT_TYPES = ("nominal", "event", "fact", "proposition", "situation",
                  "manner", "segment")


def is_abstract_referent(referent_type: str) -> bool:
    return referent_type != "nominal"


def can_be_this_antecedent(referent_type: str) -> bool:
    """All abstract types can be referred to by "this" (:117-122)."""
    return is_abstract_referent(referent_type)


def can_be_it_antecedent(referent_type: str) -> bool:
    """"it" naturally refers to nominals, events, situations (:124-132)."""
    return referent_type in ("nominal", "event", "situation")


# ---------------------------------------------------------------------------
# shell nouns (types.rs:462-643; Schmid 2000 taxonomy)

SHELL_NOUN_LEXICON = {
    **dict.fromkeys(
        ("fact", "reason", "evidence", "proof", "point", "truth", "result",
         "outcome", "consequence", "effect", "cause"), "factual"),
    **dict.fromkeys(
        ("claim", "statement", "argument", "answer", "question", "response",
         "reply", "assertion", "allegation", "announcement", "explanation",
         "suggestion", "recommendation", "proposal", "promise", "warning",
         "threat"), "linguistic"),
    **dict.fromkeys(
        ("idea", "belief", "thought", "view", "opinion", "impression",
         "feeling", "sense", "notion", "assumption", "understanding",
         "knowledge", "memory", "expectation", "hope", "fear", "worry",
         "concern"), "mental"),
    **dict.fromkeys(
        ("possibility", "chance", "ability", "need", "requirement",
         "necessity", "obligation", "duty", "right", "permission",
         "opportunity", "risk", "danger", "likelihood", "probability"),
        "modal"),
    **dict.fromkeys(
        ("event", "incident", "action", "step", "move", "development",
         "change", "process", "procedure", "activity", "behavior",
         "decision", "choice", "attempt", "effort", "achievement",
         "success", "failure"), "eventive"),
    **dict.fromkeys(
        ("situation", "context", "case", "circumstance", "condition",
         "state", "position", "environment", "scenario", "aspect", "factor",
         "issue", "problem", "difficulty", "challenge", "crisis",
         "dilemma"), "circumstantial"),
}

# ShellNounClass::typical_antecedent_types (types.rs:511-521)
SHELL_CLASS_ANTECEDENTS = {
    "factual": ("fact", "event"),
    "linguistic": ("proposition",),
    "mental": ("proposition", "fact"),
    "modal": ("proposition",),
    "eventive": ("event", "situation"),
    "circumstantial": ("situation",),
}

DEMONSTRATIVES = ("this", "that", "these", "those")


def classify_shell_noun(lemma: str) -> str | None:
    """types.rs:588-625 — class for a known shell noun, else None."""
    return SHELL_NOUN_LEXICON.get(lemma.lower())


def is_shell_noun(word: str) -> bool:
    return classify_shell_noun(word) is not None


def shell_noun_antecedent_types(shell_class: str) -> tuple:
    return SHELL_CLASS_ANTECEDENTS[shell_class]


def is_demonstrative_determiner(det: str | None) -> bool:
    """ShellNoun::is_demonstrative (:561-573)."""
    return det is not None and det.lower() in DEMONSTRATIVES


# ---------------------------------------------------------------------------
# discourse scope (types.rs:644-853)

_CLAUSE_MARKERS = (
    ", and ", ", but ", ", or ", ", so ", ", yet ", "; ", ": ", " -- ",
    " – ", " while ", " although ", " because ", " since ", " when ",
    " whereas ", " unless ", " if ",
)


def find_sentence_boundaries(text: str) -> list:
    """types.rs:675-709 — '.'/'!'/'?' followed by (whitespace|quote) and
    then an uppercase/quote two chars on; always bracketed by 0 and
    len(text)."""
    boundaries = [0]
    n = len(text)
    for i, c in enumerate(text):
        if c in ".!?":
            next_char = text[i + 1] if i + 1 < n else (
                text[i + 2] if i + 2 < n else None)
            after_space = text[i + 2] if i + 2 < n else None
            next_ok = next_char is None or next_char.isspace() or \
                next_char in "\"'"
            after_ok = after_space is None or after_space.isupper() or \
                after_space == '"'
            if next_ok and after_ok:
                boundaries.append(i + 1)
    if boundaries[-1] != n:
        boundaries.append(n)
    return boundaries


def find_clause_boundaries(text: str) -> list:
    """types.rs:711-755 — connector markers (boundary AFTER the marker)
    merged with sentence boundaries, sorted, deduped."""
    boundaries = [0]
    lower = text.lower()
    for marker in _CLAUSE_MARKERS:
        search_from = 0
        while True:
            pos = lower.find(marker, search_from)
            if pos < 0:
                break
            absolute = pos + len(marker)
            boundaries.append(absolute)
            search_from = absolute
    boundaries.extend(find_sentence_boundaries(text))
    return sorted(set(boundaries))


@dataclass
class DiscourseScope:
    """types.rs:644-853 — heuristic sentence/clause boundary tracker."""

    sentence_boundaries: list = field(default_factory=list)
    clause_boundaries: list = field(default_factory=list)

    @classmethod
    def analyze(cls, text: str) -> "DiscourseScope":
        return cls(find_sentence_boundaries(text),
                   find_clause_boundaries(text))

    def sentence_count(self) -> int:
        return max(len(self.sentence_boundaries) - 1, 0)

    def clause_count(self) -> int:
        return max(len(self.clause_boundaries) - 1, 0)

    def _span_at(self, boundaries: list, offset: int) -> tuple | None:
        for a, b in zip(boundaries, boundaries[1:]):
            if a <= offset < b:
                return (a, b)
        return None

    def sentence_at(self, offset: int) -> tuple | None:
        return self._span_at(self.sentence_boundaries, offset)

    def clause_at(self, offset: int) -> tuple | None:
        return self._span_at(self.clause_boundaries, offset)

    def preceding_clauses(self, offset: int, n: int) -> list:
        """types.rs:791-814 — up to n clauses before the one containing
        offset, nearest first."""
        b = self.clause_boundaries
        current = None
        for i in range(len(b) - 1):
            if b[i] <= offset < b[i + 1]:
                current = i
                break
        out = []
        if current is not None:
            for i in range(current - 1, max(current - 1 - n, -1), -1):
                if i + 1 < len(b):
                    out.append((b[i], b[i + 1]))
        return out

    @staticmethod
    def extract_span(text: str, start: int, end: int) -> str:
        return text[start:end] if 0 <= start <= end <= len(text) else ""

    def candidate_antecedent_spans(self, anaphor_offset: int) -> list:
        """types.rs:824-853 — preceding clauses then preceding
        sentences, sorted nearest-first (descending start), deduped
        preserving order."""
        candidates = list(self.preceding_clauses(anaphor_offset, 3))
        sent = self.sentence_at(anaphor_offset)
        if sent is not None:
            sent_start = sent[0]
            sb = self.sentence_boundaries
            for a, b in zip(sb, sb[1:]):
                if b <= sent_start:
                    candidates.append((a, b))
        candidates.sort(key=lambda s: -s[0])
        seen = set()
        out = []
        for span in candidates:
            if span not in seen:
                seen.add(span)
                out.append(span)
        return out


# ---------------------------------------------------------------------------
# event coreference (types.rs:875-1131)


def event_mention(trigger: str, start: int, end: int,
                  trigger_type: str | None = None,
                  arguments: list | None = None,
                  confidence: float = 1.0,
                  polarity: str = "positive",
                  tense: str = "unspecified") -> dict:
    """EventMention (types.rs:170-302) as a plain dict."""
    return {"trigger": trigger, "trigger_start": start, "trigger_end": end,
            "trigger_type": trigger_type, "arguments": arguments or [],
            "confidence": confidence, "polarity": polarity, "tense": tense}


def get_argument(event: dict, role: str) -> str | None:
    for r, v in event["arguments"]:
        if r == role:
            return v
    return None


def simple_stem(word: str) -> str:
    """types.rs:1043-1072 — nominalization/inflection stripper with the
    doubled-consonant pop (invaded/invasion/invade → invad)."""
    s = word
    if s.endswith("ation"):
        s = s[:-len("ation")]
    elif s.endswith("tion") or s.endswith("sion"):
        s = s[:-len("ion")]
    elif s.endswith("ing"):
        s = s[:-len("ing")]
    elif s.endswith("ed") and len(s) > 3:
        s = s[:-2]
    elif s.endswith("s") and len(s) > 2 and not s.endswith("ss"):
        s = s[:-1]
    if len(s) > 2 and s[-1] == s[-2]:
        s = s[:-1]
    return s


def triggers_match(a: str, b: str) -> bool:
    """types.rs:1074-1089 — exact or stem-equal (case-insensitive)."""
    a, b = a.lower(), b.lower()
    return a == b or simple_stem(a) == simple_stem(b)


def values_similar(a: str, b: str) -> bool:
    """types.rs:1116-1121 — equality or substring containment."""
    a, b = a.lower(), b.lower()
    return a == b or b in a or a in b


def arg_overlap(a: dict, b: dict) -> float:
    """types.rs:1091-1113 — matched same-role similar-value pairs over
    max(len); both-empty → 1.0."""
    if not a["arguments"] and not b["arguments"]:
        return 1.0
    total = max(len(a["arguments"]), len(b["arguments"]))
    if total == 0:
        return 1.0
    matches = 0
    for role_a, val_a in a["arguments"]:
        for role_b, val_b in b["arguments"]:
            if role_a == role_b and values_similar(val_a, val_b):
                matches += 1
                break
    return matches / total


def should_corefer(a: dict, b: dict, require_type_match: bool = True,
                   min_arg_overlap: float = 0.3) -> bool:
    """types.rs:1012-1041 — type gate (only when both typed), trigger
    stem match, then argument overlap."""
    if require_type_match:
        ta, tb = a["trigger_type"], b["trigger_type"]
        if ta is not None and tb is not None and ta != tb:
            return False
    if not triggers_match(a["trigger"], b["trigger"]):
        return False
    if min_arg_overlap > 0.0 and arg_overlap(a, b) < min_arg_overlap:
        return False
    return True


def resolve_event_coref(mentions: list, require_type_match: bool = True,
                        min_arg_overlap: float = 0.3) -> list:
    """EventCorefResolver::resolve (types.rs:976-1010): greedy
    first-fit clustering in mention order. Returns clusters as dicts
    {id, mentions, event_type (first typed mention's), confidence}."""
    clusters = []
    assigned = [False] * len(mentions)
    for i, anchor in enumerate(mentions):
        if assigned[i]:
            continue
        members = [anchor]
        assigned[i] = True
        for j in range(i + 1, len(mentions)):
            if assigned[j]:
                continue
            if should_corefer(anchor, mentions[j], require_type_match,
                              min_arg_overlap):
                members.append(mentions[j])
                assigned[j] = True
        event_type = next((m["trigger_type"] for m in members
                           if m["trigger_type"] is not None), None)
        clusters.append({"id": len(clusters), "mentions": members,
                         "event_type": event_type, "confidence": 1.0})
    return clusters


def canonical_trigger(cluster: dict) -> str:
    """EventCluster::canonical_trigger (types.rs:924-930)."""
    return cluster["mentions"][0]["trigger"] if cluster["mentions"] else ""

"""C1–C3 — within-document coreference (SURVEY §2.5).

Behavioral re-implementation of the reference's rule-based coref
(anno/src/cli/utils.rs:322-548):

* C1 pronoun detection: he/him/his, she/her/hers, it/its, they/them/their/
  theirs as whole words (scanned in that group order); each occurrence not
  already covered by an exact-span signal becomes a "PRON" signal with
  confidence 0.9 (utils.rs:324-422)
* C2 track formation: PER/ORG/LOC signals grouped by
  normalize_entity_name = lowercase + trim (utils.rs:249-251, 424-470);
  one track per group; track ids are assigned in first-occurrence order
  (the reference iterates a HashMap — nondeterministic; documented
  divergence, SURVEY §7.3)
* C3 pronoun→antecedent: gender-compatibility via small first-name lists
  (utils.rs:253-315); nearest strictly-preceding compatible mention wins
  (strict <, so the earliest-scanned wins ties); the pronoun joins that
  mention's track (utils.rs:472-548)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .entity import Mention

MALE_PRONOUNS = ("he", "him", "his")
FEMALE_PRONOUNS = ("she", "her", "hers")
NEUTRAL_PRONOUNS = ("they", "them", "their", "theirs")
ORG_PRONOUNS = ("it", "its")

MALE_NAMES = frozenset((
    "james", "john", "robert", "michael", "william", "david", "richard",
    "joseph", "thomas", "charles", "barack", "donald", "joe", "george",
    "bill", "vladimir", "emmanuel", "boris", "xi", "narendra", "justin",
    "elon", "jeff", "mark", "steve", "tim", "satya", "sundar", "albert",
    "isaac", "stephen", "neil", "peter", "paul", "matthew", "andrew",
    "philip", "simon",
))

FEMALE_NAMES = frozenset((
    "mary", "patricia", "jennifer", "linda", "elizabeth", "angela", "marie",
    "susan", "margaret", "dorothy", "hillary", "nancy", "kamala", "michelle",
    "melania", "jill", "theresa", "ursula", "christine", "sanna", "jacinda",
    "oprah", "beyonce", "taylor", "sheryl", "marissa", "ginni", "diana",
    "catherine", "anne", "victoria", "queen", "jane", "sarah",
))


def normalize_entity_name(name: str) -> str:
    """utils.rs:249-251 — lowercase then trim."""
    return name.lower().strip()


def is_likely_male(name: str) -> bool:
    parts = name.split()
    first = parts[0].lower() if parts else ""
    return first in MALE_NAMES


def is_likely_female(name: str) -> bool:
    parts = name.split()
    first = parts[0].lower() if parts else ""
    return first in FEMALE_NAMES


@dataclass
class CorefResult:
    """Signals (NER mentions + detected pronouns) and tracks for one doc."""

    signals: list  # list[Mention]; index == signal id
    pronoun_signal_ids: list  # [(signal_id, ptype)]
    tracks: list = field(default_factory=list)  # Track objects
    signal_to_track: dict = field(default_factory=dict)


def detect_pronouns(text: str, existing: list[Mention]) -> list[tuple[Mention, str]]:
    """C1 (utils.rs:338-422) → [(pronoun Mention, ptype)] in scan order."""
    text_lower = text.lower()
    if len(text_lower) != len(text):  # pathological case-fold growth; stay aligned
        text_lower = "".join(c.lower() if len(c.lower()) == 1 else c for c in text)
    n = len(text)
    spans_seen = {(m.start, m.end) for m in existing}
    found: list[tuple[Mention, str]] = []
    for pronouns, ptype in (
        (MALE_PRONOUNS, "male"),
        (FEMALE_PRONOUNS, "female"),
        (ORG_PRONOUNS, "org"),
        (NEUTRAL_PRONOUNS, "any"),
    ):
        for pronoun in pronouns:
            plen = len(pronoun)
            start = 0
            while True:
                pos = text_lower.find(pronoun, start)
                if pos == -1:
                    break
                end = pos + plen
                is_word_start = pos == 0 or not text[pos - 1].isalnum()
                is_word_end = end >= n or not text[end].isalnum()
                if is_word_start and is_word_end and (pos, end) not in spans_seen:
                    m = Mention(text[pos:end], "PRON", pos, end, 0.9, "pronoun", "coref")
                    found.append((m, ptype))
                    spans_seen.add((pos, end))
                start = pos + 1
    return found


_TYPE_GROUPS = {
    "per": "per", "person": "per",
    "org": "org", "organization": "org",
    "loc": "loc", "location": "loc", "gpe": "loc",
}


def resolve_coreference(text: str, ner_mentions: list[Mention]) -> CorefResult:
    """C1+C2+C3 over one document. Signal ids are list indices: NER mentions
    first (input order), then detected pronouns (scan order)."""
    signals: list[Mention] = list(ner_mentions)
    pronouns = detect_pronouns(text, ner_mentions)
    pronoun_ids = []
    for m, ptype in pronouns:
        signals.append(m)
        pronoun_ids.append((len(signals) - 1, ptype))

    # Group NER signals by coarse type (utils.rs:425-443).
    per_ids: list[int] = []
    org_ids: list[int] = []
    loc_ids: list[int] = []
    for sid in range(len(ner_mentions)):
        grp = _TYPE_GROUPS.get(signals[sid].entity_type.lower())
        if grp == "per":
            per_ids.append(sid)
        elif grp == "org":
            org_ids.append(sid)
        elif grp == "loc":
            loc_ids.append(sid)

    # C2 — one track per (type, normalized surface), first-occurrence order.
    from .entity import Track

    result = CorefResult(signals=signals, pronoun_signal_ids=pronoun_ids)
    for group in (per_ids, org_ids, loc_ids):
        if not group:
            continue
        canonical_groups: dict[str, list[int]] = {}
        for sid in group:
            canonical = normalize_entity_name(signals[sid].text)
            canonical_groups.setdefault(canonical, []).append(sid)
        for canonical, sids in canonical_groups.items():
            track = Track(
                track_id=len(result.tracks),
                canonical_surface=canonical,
                entity_type=signals[sids[0]].entity_type,
                signal_ids=list(sids),
            )
            result.tracks.append(track)
            for sid in sids:
                result.signal_to_track[sid] = track.track_id

    # C3 — link pronouns to nearest preceding compatible antecedent.
    for pid, ptype in pronoun_ids:
        pronoun_start = signals[pid].start
        if ptype == "male":
            compatible = [i for i in per_ids if is_likely_male(signals[i].text)]
        elif ptype == "female":
            compatible = [i for i in per_ids if is_likely_female(signals[i].text)]
        elif ptype == "org":
            compatible = org_ids
        elif ptype == "any":
            compatible = per_ids + org_ids
        else:
            continue
        nearest = None
        nearest_dist = None
        for sid in compatible:
            end = signals[sid].end
            if end < pronoun_start:
                distance = pronoun_start - end
                if nearest_dist is None or distance < nearest_dist:
                    nearest, nearest_dist = sid, distance
        if nearest is not None and nearest in result.signal_to_track:
            tid = result.signal_to_track[nearest]
            result.tracks[tid].signal_ids.append(pid)
            result.signal_to_track[pid] = tid

    return result

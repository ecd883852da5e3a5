"""R2 — ACE-style event-trigger extraction (SURVEY §2.4).

Behavioral re-implementation of the reference's rule-based extractor
(anno/src/discourse/event_extractor.rs:1112-1155):

* offset-preserving tokenizer: words = runs of alnum/'/- chars
  (event_extractor.rs:1220-1243); offsets here are char offsets (the
  reference uses byte offsets internally; ASCII triggers make the
  trigger-word offsets equal, and our arguments carry text not offsets)
* lexicon lookup per lowercased token (event_extractor.rs:823-826); the
  trigger map is an ABRIDGED transcription of the reference's ~700-entry
  lexicon (event_extractor.rs:89-772) — every event type and the
  highest-frequency trigger families are covered; extend per category
  as needed
* polarity from a 3-word negation/modal window (rs:1246-1268)
* tense: future/hypothetical markers in a 3-word window, -ed / irregular
  past list / -ing (rs:1271-1409; irregular list transcribed in full)
* Agent/Patient = nearest capitalized word ≤5 tokens before/after,
  skipping sentence-start words for Agent (rs:1412-1454)
* NER entities override heuristic arguments when within 50 chars
  (extract_with_entities, rs:1178-1217)
"""

from __future__ import annotations

from dataclasses import dataclass, field

POSITIVE = "positive"
NEGATIVE = "negative"
UNCERTAIN = "uncertain"

PAST = "past"
PRESENT = "present"
FUTURE = "future"
HYPOTHETICAL = "hypothetical"


def _family(stem: str, etype: str, forms=None) -> dict:
    """stem → {base, -s, -ed/-d, -ing} with e-drop morphology."""
    if forms is None:
        past = stem + "d" if stem.endswith("e") else stem + "ed"
        ing = (stem[:-1] if stem.endswith("e") else stem) + "ing"
        forms = (stem, stem + "s", past, ing)
    else:
        forms = tuple(stem + s for s in forms)
    return {w: (etype, None) for w in forms}


def _build_triggers() -> dict:
    t: dict[str, tuple[str, str | None]] = {}
    # === Conflict (rs:92-180) ===
    for stem in ("attack", "bomb", "strike", "assault", "fight", "battle", "kill", "murder"):
        t.update(_family(stem, "conflict:attack"))
    t.update(
        {
            "invade": ("conflict:attack", None), "invaded": ("conflict:attack", None),
            "invading": ("conflict:attack", None), "invades": ("conflict:attack", None),
            "invasion": ("conflict:attack", None), "bombardment": ("conflict:attack", None),
            "struck": ("conflict:attack", None), "fought": ("conflict:attack", None),
            "war": ("conflict:attack", None), "warfare": ("conflict:attack", None),
            "protest": ("conflict:demonstrate", None), "protested": ("conflict:demonstrate", None),
            "protesting": ("conflict:demonstrate", None), "protests": ("conflict:demonstrate", None),
            "demonstration": ("conflict:demonstrate", None), "riot": ("conflict:demonstrate", None),
        }
    )
    # === Movement (rs:181-244) ===
    for stem in ("travel", "move", "arrive", "depart", "migrate", "flee"):
        t.update(_family(stem, "movement:transport"))
    t.update({"fled": ("movement:transport", None), "went": ("movement:transport", None),
              "came": ("movement:transport", None), "transported": ("movement:transport", None)})
    # === Transaction (rs:245-291) ===
    for stem in ("buy", "sell", "purchase", "pay", "acquire", "donate"):
        t.update(_family(stem, "transaction:transfer"))
    t.update({"bought": ("transaction:transfer", None), "sold": ("transaction:transfer", None),
              "paid": ("transaction:transfer", None), "acquisition": ("transaction:transfer", None)})
    # === Business (rs:292-370) ===
    for stem in ("launch", "found", "merge", "expand", "bankrupt"):
        t.update(_family(stem, "business:event"))
    t.update({"founded": ("business:event", None), "merger": ("business:event", None),
              "startup": ("business:event", None), "ipo": ("business:event", None),
              "bankruptcy": ("business:event", None), "released": ("business:event", None)})
    # === Contact (rs:371-447) ===
    for stem in ("meet", "visit", "negotiate"):
        t.update(_family(stem, "contact:meet"))
    for stem in ("announce", "declare", "report", "state", "publish"):
        t.update(_family(stem, "contact:communicate"))
    t.update({"met": ("contact:meet", None), "summit": ("contact:meet", None),
              "said": ("contact:communicate", None), "told": ("contact:communicate", None),
              "spoke": ("contact:communicate", None), "statement": ("contact:communicate", None)})
    # === Personnel (rs:448-518) ===
    for stem in ("hire", "fire", "resign", "retire", "appoint", "promote", "elect"):
        t.update(_family(stem, "personnel:event"))
    t.update({"hired": ("personnel:event", None), "resignation": ("personnel:event", None),
              "layoff": ("personnel:event", None), "layoffs": ("personnel:event", None)})
    # === Justice (rs:519-629) ===
    t.update(_family("arrest", "justice:arrest"))
    t.update(_family("charge", "justice:charge"))
    t.update(_family("convict", "justice:convict"))
    t.update(_family("sue", "justice:sue", ("", "s", "d", "ing")))
    t.update(_family("release", "justice:release", ("", "s", "d")))
    t.update({"arrested": ("justice:arrest", None), "indicted": ("justice:charge", None),
              "sentenced": ("justice:convict", None), "acquitted": ("justice:release", None),
              "lawsuit": ("justice:sue", None), "sued": ("justice:sue", None)})
    # === Life (rs:630-665) ===
    for stem in ("born", "marry", "divorce", "die", "injure"):
        t.update(_family(stem, "life:event"))
    t.update({"birth": ("life:event", None), "died": ("life:event", None),
              "death": ("life:event", None), "married": ("life:event", None),
              "wedding": ("life:event", None), "wounded": ("life:event", None)})
    # === Natural disaster (rs:666-694) ===
    for w in ("earthquake", "flood", "hurricane", "tornado", "tsunami", "wildfire", "drought", "landslide"):
        t[w] = ("disaster:natural", None)
    t["floods"] = ("disaster:natural", None)
    t["earthquakes"] = ("disaster:natural", None)
    # === Technical/system (rs:695-726) ===
    for w in ("outage", "crash", "crashed", "failure", "breach", "hack", "hacked", "malfunction"):
        t[w] = ("technical:failure", None)
    # === Economic (rs:727-772) ===
    for w in ("recession", "inflation", "surge", "surged", "plunge", "plunged", "rally", "rallied", "crisis"):
        t[w] = ("economic:change", None)
    return t


TRIGGERS = _build_triggers()

MODAL_VERBS = frozenset(("might", "may", "could", "would", "should", "can", "will"))

NEGATION_WORDS = frozenset(
    (
        "not", "never", "no", "none", "neither", "nobody", "nothing",
        "nowhere", "hardly", "scarcely", "barely", "don't", "doesn't",
        "didn't", "won't", "wouldn't", "couldn't", "shouldn't", "can't",
        "cannot", "hasn't", "haven't", "hadn't", "isn't", "aren't",
        "wasn't", "weren't",
    )
)

IRREGULAR_PAST = frozenset(
    (
        "went", "came", "said", "took", "gave", "made", "got", "found",
        "knew", "thought", "felt", "became", "left", "held", "brought",
        "began", "kept", "put", "set", "saw", "heard", "told", "stood",
        "lost", "paid", "met", "ran", "sent", "built", "fell", "caught",
        "wrote", "sat", "led", "rose", "spoke", "won", "broke", "spent",
        "hit", "cut", "sold", "bought", "shot", "struck", "shut", "threw",
        "drove", "flew", "drew", "grew", "sang", "swam", "rang", "wore",
        "chose", "woke", "froze", "stole", "blew", "ate", "drank", "rode",
        "shook", "bit", "hid", "tore", "beat", "laid", "spread", "hurt",
        "fought", "hung", "slept", "swept", "bent", "dealt", "fed", "fled",
        "dug", "spun", "wove", "sank", "shone", "swung", "clung", "crept",
        "burnt", "leapt", "meant", "lent", "dwelt", "dreamt", "knelt",
        "split", "spit", "bid", "forbid", "shed", "rid", "burst", "stuck",
        "slid",
    )
)

SENTENCE_START_WORDS = frozenset(
    ("the", "a", "an", "this", "that", "these", "those", "it", "he", "she", "they", "we", "i")
)


@dataclass
class EventMention:
    trigger: str
    trigger_start: int  # char offsets
    trigger_end: int
    event_type: str
    polarity: str
    tense: str | None
    confidence: float
    arguments: list = field(default_factory=list)  # [(role, text)]


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """rs:1220-1243 — words = runs of alnum/'/-, char offsets."""
    tokens = []
    start = None
    for i, c in enumerate(text):
        if c.isalnum() or c in ("'", "-"):
            if start is None:
                start = i
        elif start is not None:
            tokens.append((text[start:i], start, i))
            start = None
    if start is not None:
        tokens.append((text[start:], start, len(text)))
    return tokens


def detect_polarity(words, trigger_idx: int, hint: str | None) -> str:
    lo = max(trigger_idx - 3, 0)
    for w, _, _ in words[lo:trigger_idx]:
        if w.lower() in NEGATION_WORDS:
            return NEGATIVE
    for w, _, _ in words[lo:trigger_idx]:
        if w.lower() in MODAL_VERBS:
            return UNCERTAIN
    return hint or POSITIVE


def detect_tense(words, trigger_idx: int, trigger: str) -> str | None:
    tl = trigger.lower()
    lo = max(trigger_idx - 3, 0)
    for w, _, _ in words[lo:trigger_idx]:
        wl = w.lower()
        if wl in ("will", "going", "shall"):
            return FUTURE
        if wl in ("would", "could", "might", "may"):
            return HYPOTHETICAL
    if tl.endswith("ed") or tl in IRREGULAR_PAST:
        return PAST
    if tl.endswith("ing"):
        return PRESENT
    return None


def extract_arguments(words, trigger_idx: int) -> list:
    args = []
    for w, _, _ in reversed(words[max(trigger_idx - 5, 0):trigger_idx]):
        if len(w) > 1 and w[0].isupper() and w.lower() not in SENTENCE_START_WORDS:
            args.append(("Agent", w))
            break
    for w, _, _ in words[trigger_idx + 1 : trigger_idx + 6]:
        if len(w) > 1 and w[0].isupper():
            args.append(("Patient", w))
            break
    return args


def extract_events(text: str) -> list[EventMention]:
    """rs:1112-1155 — rule-based extraction over the trigger lexicon."""
    words = tokenize(text)
    events = []
    for idx, (word, start, end) in enumerate(words):
        hit = TRIGGERS.get(word.lower())
        if hit is None:
            continue
        event_type, hint = hit
        events.append(
            EventMention(
                trigger=word,
                trigger_start=start,
                trigger_end=end,
                event_type=event_type,
                polarity=detect_polarity(words, idx, hint),
                tense=detect_tense(words, idx, word),
                confidence=0.8,
                arguments=extract_arguments(words, idx),
            )
        )
    return events


def extract_events_with_entities(text: str, entities) -> list[EventMention]:
    """rs:1178-1217 — NER entities override heuristic Agent/Patient when
    within 50 chars of the trigger (last agent before, first patient
    after)."""
    events = extract_events(text)
    for ev in events:
        agents = [e for e in entities if e.end <= ev.trigger_start and ev.trigger_start - e.end < 50]
        patients = [e for e in entities if e.start >= ev.trigger_end and e.start - ev.trigger_end < 50]
        if agents:
            ev.arguments = [(r, v) for r, v in ev.arguments if r != "Agent"]
            ev.arguments.append(("Agent", agents[-1].text))
        if patients:
            ev.arguments = [(r, v) for r, v in ev.arguments if r != "Patient"]
            ev.arguments.append(("Patient", patients[0].text))
    return events

"""Abstract-anaphora evaluation (reference:
anno/src/eval/abstract_anaphora.rs:55-2720 +
eval/coref_resolver.rs:660-1045 DiscourseAwareResolver).

Abstract anaphors ("Russia invaded Ukraine. **This** shocked the
world.") refer to events/facts/propositions/situations, which entity
coreference cannot resolve. The reference ships 86 hand-built test
cases across 8 collections (standard/extended + legal/medical/
financial/scientific/news domains + challenging,
abstract_anaphora.rs:214-2076), evaluates two resolver backends
(the simple nominal resolver — expected to FAIL on abstract cases —
and the discourse-aware resolver that searches event/clause
antecedents), and reports accuracy split nominal vs abstract and per
abstract type (evaluate, :2336-2367). Shell-noun analysis
(:2619-2691) and Marasović-2017-style candidate-ranking metrics
(:2172-2234) round out the module.

Distributed shape: each test case is independent per-document work —
the Spark path runs the transcribed evaluator inside ``mapInPandas``
over the case table and rolls accuracies up with groupBys, so the
same evaluator scores millions of generated cases unchanged.

Adaptations and quirks preserved:

* the simple-resolver path feeds the engine's SimpleCorefResolver port
  (eval/coref_resolver.py) with the same simulated-NER entities the
  reference builds (:2474-2520): named antecedent + anaphor for
  nominal cases, capitalized-word entities + an "abstract_anaphor"
  mention for abstract ones — the expected failures are the point;
* the discourse path marks ``antecedent_found``/``anaphor_found`` True
  and ids Some(0)/conditional (:2453-2465) — transcribed;
* entity-type inference (:2561-2604): pronouns → PER, "the company/
  firm/organization" prefix → ORG, Inc./Corp./LLC suffix → ORG,
  Dr./Mr./Ms./Prof. prefix → PER, capitalized → PER, else unknown;
* ``is_sentence_starter`` only fires at position 0 of the ANTECEDENT
  SLICE, not the sentence (:2547-2553) — transcribed;
* discourse success = found referent span overlaps the gold antecedent
  span OR the referent text contains the gold trigger (:2425-2440).
"""

from __future__ import annotations

from ..core.discourse import (
    DiscourseScope,
    classify_shell_noun,
    is_demonstrative_determiner,
    shell_noun_antecedent_types,
)
from ..core.events import extract_events
from . import coref_resolver as cr

ANAPHORA_TYPES = ("nominal", "event", "fact", "proposition", "situation")

# Event-type prefixes that read as Event referents
# (coref_resolver.rs:970-995 infer_referent_type)
_EVENT_PREFIXES = ("conflict:", "movement:", "transaction:", "justice:",
                   "personnel:", "life:", "disaster:", "business:")


def is_abstract_type(anaphora_type: str) -> bool:
    return anaphora_type != "nominal"


# ---------------------------------------------------------------------------
# simulated NER for the simple-resolver path (abstract_anaphora.rs:2474-2604)

_PRONOUNS_PER = ("he", "him", "his", "she", "her", "hers", "they", "them",
                 "their")
_SENTENCE_STARTERS = ("the", "a", "an", "this", "that", "it", "he", "she",
                      "they")


def infer_entity_type(text: str) -> str:
    """abstract_anaphora.rs:2561-2604 → engine labels PER/ORG/unknown."""
    lower = text.lower()
    if lower in _PRONOUNS_PER:
        return "PER"
    if (lower.startswith("the company") or lower.startswith("the firm")
            or lower.startswith("the organization")):
        return "ORG"
    if text.endswith("Inc.") or text.endswith("Corp.") or text.endswith("LLC"):
        return "ORG"
    if (text.startswith("Dr.") or text.startswith("Mr.")
            or text.startswith("Ms.") or text.startswith("Prof.")):
        return "PER"
    if text[:1].isupper():
        return "PER"
    return "unknown"


def is_sentence_starter(word: str, pos: int) -> bool:
    """:2547-2553 — only at slice position 0."""
    return pos == 0 and word.lower() in _SENTENCE_STARTERS


def extract_named_entities(text: str, offset: int) -> list:
    """Capitalized-word scan (:2522-2545): word = run up to whitespace
    or '.'/',' ; single-char words and slice-initial articles skipped."""
    entities = []
    for i, c in enumerate(text):
        if c.isupper() and (i == 0 or text[i - 1].isspace()):
            end = len(text)
            for j in range(i, len(text)):
                if text[j].isspace() or text[j] in ".,":
                    end = j
                    break
            word = text[i:end]
            if len(word) > 1 and not is_sentence_starter(word, i):
                entities.append({"text": word,
                                 "entity_type": infer_entity_type(word),
                                 "start": offset + i, "end": offset + end,
                                 "confidence": 0.7})
    return entities


def extract_entities_for_case(case: dict) -> list:
    """:2474-2520 — simulated NER input for the resolver."""
    ante, ana = case["antecedent"], case["anaphor"]
    if case["anaphora_type"] == "nominal":
        return [
            {"text": ante["text"], "entity_type": infer_entity_type(ante["text"]),
             "start": ante["start"], "end": ante["end"], "confidence": 0.9},
            {"text": ana["text"], "entity_type": infer_entity_type(ana["text"]),
             "start": ana["start"], "end": ana["end"], "confidence": 0.85},
        ]
    entities = extract_named_entities(ante["text"], ante["start"])
    entities.append({"text": ana["text"], "entity_type": "abstract_anaphor",
                     "start": ana["start"], "end": ana["end"],
                     "confidence": 0.8})
    return entities


def text_matches(a: str, b: str) -> bool:
    """Case-insensitive, alnum+whitespace only (:2606-2616)."""
    def norm(s):
        return "".join(c for c in s.lower() if c.isalnum() or c.isspace())
    return norm(a) == norm(b)


# ---------------------------------------------------------------------------
# shell nouns (:2619-2691)


def detect_shell_noun(anaphor_text: str) -> dict | None:
    """det + shell noun NP, or a bare shell noun (:2619-2660)."""
    words = anaphor_text.split()
    if len(words) >= 2:
        det = words[0].lower()
        if det in ("this", "that", "the", "these", "those"):
            noun = "".join(c for c in words[-1].lower() if c.isalnum())
            cls = classify_shell_noun(noun)
            if cls is not None:
                return {"lemma": noun, "class": cls, "determiner": det,
                        "full_text": anaphor_text}
    if len(words) == 1:
        noun = "".join(c for c in words[0].lower() if c.isalnum())
        cls = classify_shell_noun(noun)
        if cls is not None:
            return {"lemma": noun, "class": cls, "determiner": None,
                    "full_text": anaphor_text}
    return None


def analyze_shell_nouns(cases: list) -> dict:
    """ShellNounAnalysis (:2661-2691): counts, demonstrative ratio,
    class-vs-anaphora-type match ratio."""
    total = demonstrative = type_match = 0
    by_class: dict = {}
    for case in cases:
        shell = detect_shell_noun(case["anaphor"]["text"])
        if shell is None:
            continue
        total += 1
        by_class[shell["class"]] = by_class.get(shell["class"], 0) + 1
        if is_demonstrative_determiner(shell["determiner"]):
            demonstrative += 1
        if case["anaphora_type"] in shell_noun_antecedent_types(shell["class"]):
            type_match += 1
    return {
        "total_shell_nouns": total,
        "by_class": by_class,
        "demonstrative_count": demonstrative,
        "type_match_count": type_match,
        "demonstrative_ratio": demonstrative / total if total else 0.0,
        "type_match_ratio": type_match / total if total else 0.0,
    }


def ranking_metrics(rankings: list) -> dict:
    """CandidateRankingMetrics::from_rankings (:2185-2223):
    (gold_rank 1-indexed | 0 = missing, num_candidates) tuples."""
    if not rankings:
        return {"accuracy_at_1": 0.0, "mrr": 0.0, "containment": 0.0,
                "avg_candidates": 0.0, "total_cases": 0}
    total = len(rankings)
    correct1 = sum(1 for r, _ in rankings if r == 1)
    contained = sum(1 for r, _ in rankings if r > 0)
    reciprocal = sum(1.0 / r for r, _ in rankings if r > 0)
    cands = sum(n for _, n in rankings)
    return {"accuracy_at_1": correct1 / total, "mrr": reciprocal / total,
            "containment": contained / total,
            "avg_candidates": cands / total, "total_cases": total}


# ---------------------------------------------------------------------------
# discourse-aware resolver (coref_resolver.rs:721-1045)


class DiscourseResolver:
    """DiscourseAwareResolver port: scope analysis + the engine's event
    extractor (core/events.py) feeding event-first antecedent search
    with span-heuristic fallback."""

    def __init__(self, text: str, detect_shell_nouns: bool = True,
                 max_sentence_distance: int = 3):
        self.text = text
        self.detect_shell_nouns = detect_shell_nouns
        self.max_sentence_distance = max_sentence_distance
        self.scope = DiscourseScope.analyze(text)
        self.events = extract_events(text)

    def find_event_near(self, offset: int, max_distance: int = 200):
        """coref_resolver.rs:758-790 — same-clause events first, then
        nearest within distance."""
        clause = self.scope.clause_at(offset)
        if clause is not None:
            cs, ce = clause
            for event in self.events:
                if event.trigger_start >= cs and event.trigger_end <= ce:
                    return event
        best, best_dist = None, None
        for e in self.events:
            if e.trigger_end <= offset:
                dist = offset - e.trigger_end
            else:
                dist = max(e.trigger_start - offset, 0)
            if dist <= max_distance and (best_dist is None or dist < best_dist):
                best, best_dist = e, dist
        return best

    def find_event_clause_span(self, event) -> tuple:
        """:920-940 — clause → sentence → trigger±30 chars."""
        span = self.scope.clause_at(event.trigger_start)
        if span is not None:
            return span
        span = self.scope.sentence_at(event.trigger_start)
        if span is not None:
            return span
        return (max(event.trigger_start - 30, 0),
                min(event.trigger_end + 30, len(self.text)))

    def is_abstract_anaphor(self, text: str) -> bool:
        """:829-856 — bare demonstratives or det + shell noun."""
        lower = text.lower()
        if lower in ("this", "that", "it"):
            return True
        words = lower.split()
        if len(words) >= 2:
            det = words[0]
            noun = "".join(c for c in words[-1] if c.isalnum())
            if det in ("this", "that", "the", "such") and \
                    classify_shell_noun(noun) is not None:
                return True
        return False

    def infer_referent_type(self, text: str) -> str:
        """:970-1026 — extracted-event triggers first, then indicator
        heuristics, defaulting to event."""
        lower = text.lower()
        for event in self.events:
            if event.trigger.lower() in lower:
                etype = event.event_type
                if etype:
                    if any(etype.startswith(p) for p in _EVENT_PREFIXES):
                        return "event"
                    if etype.startswith("economic:"):
                        return "situation"
                return "event"
        for ind in ("ed ", " was ", " were ", " had ", " did ", " happened",
                    " occurred"):
            if ind in lower:
                return "event"
        for ind in (" is ", " are ", " equals ", " means "):
            if ind in lower:
                return "fact"
        for ind in (" might ", " may ", " could ", " would ", " should ",
                    " if "):
            if ind in lower:
                return "proposition"
        for ind in (" while ", " as ", "ing ", " continues", " remains"):
            if ind in lower:
                return "situation"
        return "event"

    def find_discourse_antecedent(self, anaphor: dict) -> dict | None:
        """:858-918 — event-first (confidence 0.85), then candidate
        spans filtered by shell-noun type compatibility (0.7)."""
        event = self.find_event_near(anaphor["start"], 200)
        if event is not None:
            start, end = self.find_event_clause_span(event)
            return {"referent_type": "event", "start": start, "end": end,
                    "text": self.text[start:end], "confidence": 0.85,
                    "event": event}
        shell_class = None
        if self.detect_shell_nouns:
            last = anaphor["text"].lower().split()
            if last:
                shell_class = classify_shell_noun(
                    "".join(c for c in last[-1] if c.isalnum()))
        for start, end in self.scope.candidate_antecedent_spans(
                anaphor["start"])[:self.max_sentence_distance]:
            span_text = self.scope.extract_span(self.text, start, end)
            if len(span_text.strip()) < 3:
                continue
            ref_type = self.infer_referent_type(span_text)
            if shell_class is not None and \
                    ref_type not in shell_noun_antecedent_types(shell_class):
                continue
            return {"referent_type": ref_type, "start": start, "end": end,
                    "text": span_text, "confidence": 0.7, "event": None}
        return None


# ---------------------------------------------------------------------------
# evaluator (abstract_anaphora.rs:2336-2720)


def diagnose_failure(case: dict, antecedent_id, anaphor_id) -> str:
    """:2693-2720."""
    shell = detect_shell_noun(case["anaphor"]["text"])
    shell_info = (f" [shell noun: {shell['lemma']} ({shell['class']})]"
                  if shell else "")
    if is_abstract_type(case["anaphora_type"]):
        return (f"Abstract anaphora ({case['anaphora_type']}) - resolver "
                f"cannot detect event/proposition antecedents{shell_info}")
    if antecedent_id is None and anaphor_id is None:
        return "Neither antecedent nor anaphor was assigned a cluster"
    if antecedent_id is None:
        return "Antecedent was not assigned a cluster"
    if anaphor_id is None:
        return "Anaphor was not assigned a cluster"
    return f"Assigned to different clusters: {antecedent_id} vs {anaphor_id}"


def evaluate_case(case: dict) -> dict:
    """Simple-resolver path (:2370-2412): run the engine's
    SimpleCorefResolver port over simulated NER, then compare the
    cluster ids found for antecedent and anaphor (matched by start
    offset or normalized text)."""
    entities = extract_entities_for_case(case)
    ids = cr.resolve([(e["text"], e["entity_type"]) for e in entities])

    def find_id(span):
        for i, e in enumerate(entities):
            if e["start"] == span["start"] or text_matches(e["text"],
                                                           span["text"]):
                return ids[i]
        return None

    antecedent_id = find_id(case["antecedent"])
    anaphor_id = find_id(case["anaphor"])
    ok = (antecedent_id is not None and anaphor_id is not None
          and antecedent_id == anaphor_id)
    return {
        "case_id": case["id"], "anaphora_type": case["anaphora_type"],
        "resolved_correctly": ok,
        "antecedent_found": antecedent_id is not None,
        "anaphor_found": anaphor_id is not None,
        "antecedent_id": antecedent_id, "anaphor_id": anaphor_id,
        "failure_reason": None if ok else diagnose_failure(
            case, antecedent_id, anaphor_id),
    }


def evaluate_case_discourse(case: dict) -> dict:
    """Discourse path (:2415-2472): abstract cases succeed when the
    found referent overlaps the gold span or contains the trigger."""
    if not is_abstract_type(case["anaphora_type"]):
        return evaluate_case(case)
    resolver = DiscourseResolver(case["text"])
    referent = resolver.find_discourse_antecedent(case["anaphor"])
    ok = False
    if referent is not None:
        ante = case["antecedent"]
        spans_overlap = (referent["start"] < ante["end"]
                         and referent["end"] > ante["start"])
        trigger_found = bool(
            ante.get("trigger")
            and referent.get("text")
            and ante["trigger"] in referent["text"])
        ok = spans_overlap or trigger_found
    return {
        "case_id": case["id"], "anaphora_type": case["anaphora_type"],
        "resolved_correctly": ok,
        "antecedent_found": True, "anaphor_found": True,
        "antecedent_id": 0, "anaphor_id": 0 if ok else None,
        "failure_reason": None if ok else
        "Discourse resolver couldn't find event antecedent",
    }


def evaluate(cases: list, use_discourse: bool = False) -> dict:
    """EvaluationResults (:2336-2367 + :2778-2860): nominal/abstract
    accuracies + per-abstract-type breakdown."""
    case_results = []
    nominal_total = nominal_correct = abstract_total = abstract_correct = 0
    by_type: dict = {}
    for case in cases:
        result = (evaluate_case_discourse(case) if use_discourse
                  else evaluate_case(case))
        case_results.append(result)
        if case["anaphora_type"] == "nominal":
            nominal_total += 1
            nominal_correct += result["resolved_correctly"]
        else:
            abstract_total += 1
            abstract_correct += result["resolved_correctly"]
            t = by_type.setdefault(case["anaphora_type"],
                                   {"total": 0, "correct": 0})
            t["total"] += 1
            t["correct"] += result["resolved_correctly"]
    return {
        "case_results": case_results,
        "nominal_total": nominal_total, "nominal_correct": nominal_correct,
        "abstract_total": abstract_total,
        "abstract_correct": abstract_correct,
        "nominal_accuracy": (nominal_correct / nominal_total
                             if nominal_total else 0.0),
        "abstract_accuracy": (abstract_correct / abstract_total
                              if abstract_total else 0.0),
        "by_type": by_type,
    }


# ---------------------------------------------------------------------------
# the 86 reference test cases (abstract_anaphora.rs:214-2076)
STANDARD_CASES = (
    ('nom_01', 'John Smith went to the store. He bought milk.',
     ('John Smith', 0, 10, None),
     ('He', 32, 34), 'nominal', 'Simple pronoun resolution - baseline case'),
    ('nom_02', 'Microsoft announced layoffs. The company cited economic conditions.',
     ('Microsoft', 0, 9, None),
     ('The company', 29, 40), 'nominal', 'Definite NP resolution'),
    ('nom_03', 'Dr. Sarah Chen published a paper. She presented it at EMNLP.',
     ('Dr. Sarah Chen', 0, 14, None),
     ('She', 35, 38), 'nominal', 'Pronoun with title prefix'),
    ('nom_04', 'The CEO of Nvidia is Jensen Huang. He co-founded the company.',
     ('Jensen Huang', 20, 32, None),
     ('He', 34, 36), 'nominal', 'Pronoun binds to proper name, not role description'),
    ('nom_05', "Apple Inc. reported record earnings. Apple's stock rose 5%.",
     ('Apple Inc.', 0, 10, None),
     ("Apple's", 37, 44), 'nominal', 'Possessive form coreference'),
    ('event_01', 'Russia invaded Ukraine in 2022. This caused a global energy crisis.',
     ('Russia invaded Ukraine in 2022', 0, 30, 'invaded'),
     ('This', 32, 36), 'event', "Classic event anaphora - 'This' refers to invasion EVENT, not Russia or Ukraine"),
    ('event_02', 'The earthquake struck at dawn. It destroyed thousands of homes.',
     ('The earthquake struck at dawn', 0, 29, 'struck'),
     ('It', 31, 33), 'event', "'It' refers to the earthquake event, not just the noun 'earthquake'"),
    ('event_03', 'The merger was announced yesterday. This surprised investors.',
     ('The merger was announced yesterday', 0, 34, 'announced'),
     ('This', 36, 40), 'event', 'Announcement event, not the merger entity'),
    ('event_04', 'Scientists discovered a new species. This happened in the Amazon.',
     ('Scientists discovered a new species', 0, 35, 'discovered'),
     ('This', 37, 41), 'event', 'Discovery event'),
    ('event_05', 'The patient underwent surgery. This took six hours.',
     ('The patient underwent surgery', 0, 29, 'underwent'),
     ('This', 31, 35), 'event', 'Medical procedure event'),
    ('fact_01', 'The Earth orbits the Sun. This is well established.',
     ('The Earth orbits the Sun', 0, 24, None),
     ('This', 26, 30), 'fact', "'This' refers to the FACT, not Earth or Sun"),
    ('fact_02', 'Water boils at 100 degrees Celsius. This is basic chemistry.',
     ('Water boils at 100 degrees Celsius', 0, 34, None),
     ('This', 36, 40), 'fact', 'Scientific fact reference'),
    ('fact_03', 'He lied under oath. This was proven in court.',
     ('He lied under oath', 0, 18, None),
     ('This', 20, 24), 'fact', 'Fact about past action'),
    ('prop_01', 'She might resign. This worries the board.',
     ('She might resign', 0, 16, None),
     ('This', 18, 22), 'proposition', "'This' refers to the POSSIBILITY of resignation"),
    ('prop_02', 'The company could go bankrupt. This scenario keeps investors awake.',
     ('The company could go bankrupt', 0, 29, None),
     ('This scenario', 31, 44), 'proposition', 'Hypothetical proposition'),
    ('prop_03', 'Interest rates may rise again. This possibility concerns economists.',
     ('Interest rates may rise again', 0, 29, None),
     ('This possibility', 31, 47), 'proposition', 'Modal proposition'),
    ('sit_01', 'Prices rose while wages fell. This was unsustainable.',
     ('Prices rose while wages fell', 0, 28, None),
     ('This', 30, 34), 'situation', "'This' refers to the combined SITUATION, not prices or wages"),
    ('sit_02', 'Traffic was gridlocked and tempers flared. This chaos lasted hours.',
     ('Traffic was gridlocked and tempers flared', 0, 41, None),
     ('This chaos', 43, 53), 'situation', 'Complex situation with multiple aspects'),
    ('sit_03', 'The server crashed, emails were lost, and backups failed. This disaster cost millions.',
     ('The server crashed, emails were lost, and backups failed', 0, 56, None),
     ('This disaster', 58, 71), 'situation', 'Multi-clause situation'),
)

EXTENDED_CASES = (
    ('shell_fact_01', 'The GDP grew by 3%. This fact surprised analysts.',
     ('The GDP grew by 3%', 0, 18, 'grew'),
     ('This fact', 20, 29), 'fact', "Shell noun 'fact' - factual class (Schmid 2000)"),
    ('shell_fact_02', 'Prices doubled in one year. The reason was supply chain disruption.',
     ('Prices doubled in one year', 0, 26, 'doubled'),
     ('The reason', 28, 38), 'fact', "Shell noun 'reason' - factual class, cataphoric"),
    ('shell_ling_01', 'The CEO promised higher wages. This claim was later retracted.',
     ('The CEO promised higher wages', 0, 29, 'promised'),
     ('This claim', 31, 41), 'proposition', "Shell noun 'claim' - linguistic class"),
    ('shell_ling_02', 'We should invest in renewables. The argument convinced the board.',
     ('We should invest in renewables', 0, 30, None),
     ('The argument', 32, 44), 'proposition', "Shell noun 'argument' - linguistic class"),
    ('shell_mental_01', 'Automation will replace most jobs. This belief is controversial.',
     ('Automation will replace most jobs', 0, 33, None),
     ('This belief', 35, 46), 'proposition', "Shell noun 'belief' - mental class"),
    ('shell_mental_02', 'The new policy will fail. This view is shared by experts.',
     ('The new policy will fail', 0, 24, None),
     ('This view', 26, 35), 'proposition', "Shell noun 'view' - mental class"),
    ('shell_modal_01', 'The system could crash under load. This possibility concerned engineers.',
     ('The system could crash under load', 0, 33, None),
     ('This possibility', 35, 51), 'proposition', "Shell noun 'possibility' - modal class"),
    ('shell_event_01', 'The company laid off 500 workers. This decision shocked employees.',
     ('The company laid off 500 workers', 0, 32, 'laid off'),
     ('This decision', 34, 47), 'event', "Shell noun 'decision' - eventive class"),
    ('shell_event_02', 'A meteor struck the desert. The incident was witnessed by campers.',
     ('A meteor struck the desert', 0, 26, 'struck'),
     ('The incident', 28, 40), 'event', "Shell noun 'incident' - eventive class"),
    ('shell_circ_01', 'Inflation is rising while wages stagnate. This situation is unsustainable.',
     ('Inflation is rising while wages stagnate', 0, 40, None),
     ('This situation', 42, 56), 'situation', "Shell noun 'situation' - circumstantial class"),
    ('shell_circ_02', 'The code has bugs and the deadline is tomorrow. This problem needs addressing.',
     ('The code has bugs and the deadline is tomorrow', 0, 46, None),
     ('This problem', 48, 60), 'situation', "Shell noun 'problem' - circumstantial class"),
    ('dist_01', 'The protests began in March. Police deployed tear gas. Several arrests were made. This response drew international criticism.',
     ('Police deployed tear gas. Several arrests were made', 29, 80, None),
     ('This response', 82, 95), 'event', 'Multi-sentence antecedent (2 sentences back)'),
)

LEGAL_CASES = (
    ('legal_01', 'The court ruled in favor of the plaintiff. This decision sets a precedent.',
     ('The court ruled in favor of the plaintiff', 0, 41, 'ruled'),
     ('This decision', 43, 56), 'event', 'Court ruling reference'),
    ('legal_02', 'The defendant violated the contract terms. This breach entitles the claimant to damages.',
     ('The defendant violated the contract terms', 0, 41, 'violated'),
     ('This breach', 43, 54), 'event', 'Legal violation reference'),
    ('legal_03', 'Corporations must disclose material information. Failure to do so constitutes fraud.',
     ('Corporations must disclose material information', 0, 47, None),
     ('Failure to do so', 49, 65), 'fact', 'Obligation reference with negation'),
    ('legal_04', 'The statute requires prior notice. This requirement was not met.',
     ('The statute requires prior notice', 0, 33, 'requires'),
     ('This requirement', 35, 51), 'fact', 'Legal requirement reference'),
    ('legal_05', 'The witness may have lied. If this is true, perjury charges apply.',
     ('The witness may have lied', 0, 25, 'lied'),
     ('this', 30, 34), 'proposition', 'Modal proposition in legal context'),
    ('legal_06', 'The parties agreed to arbitration. This agreement is binding.',
     ('The parties agreed to arbitration', 0, 33, 'agreed'),
     ('This agreement', 35, 49), 'event', 'Agreement event reference'),
    ('legal_07', 'The prosecution alleged embezzlement. The allegation was later withdrawn.',
     ('The prosecution alleged embezzlement', 0, 36, 'alleged'),
     ('The allegation', 38, 52), 'event', 'Allegation event reference'),
    ('legal_08', 'Evidence was obtained without a warrant. This fact renders it inadmissible.',
     ('Evidence was obtained without a warrant', 0, 39, 'obtained'),
     ('This fact', 41, 50), 'fact', 'Factual shell noun in legal context'),
    ('legal_nom_01', 'The defendant hired a lawyer. He filed an appeal.',
     ('a lawyer', 21, 29, None),
     ('He', 31, 33), 'nominal', 'Standard nominal coreference (lawyer)'),
)

MEDICAL_CASES = (
    ('med_01', 'The patient presented with chest pain. This symptom suggested cardiac involvement.',
     ('The patient presented with chest pain', 0, 37, 'presented'),
     ('This symptom', 39, 51), 'fact', 'Symptom presentation reference'),
    ('med_02', 'Surgery was performed to remove the tumor. This procedure lasted four hours.',
     ('Surgery was performed to remove the tumor', 0, 41, 'performed'),
     ('This procedure', 43, 57), 'event', 'Surgical procedure reference'),
    ('med_03', 'Blood pressure normalized after treatment. This improvement was sustained.',
     ('Blood pressure normalized after treatment', 0, 41, 'normalized'),
     ('This improvement', 43, 59), 'event', 'Clinical improvement reference'),
    ('med_04', 'The medication may cause drowsiness. This side effect is usually temporary.',
     ('The medication may cause drowsiness', 0, 35, 'cause'),
     ('This side effect', 37, 53), 'proposition', 'Potential side effect reference'),
    ('med_05', 'The patient was diagnosed with diabetes. Managing this condition requires lifestyle changes.',
     ('diabetes', 31, 39, None),
     ('this condition', 51, 65), 'situation', 'Medical condition reference'),
    ('med_06', 'The biopsy revealed malignant cells. This finding necessitated further testing.',
     ('The biopsy revealed malignant cells', 0, 35, 'revealed'),
     ('This finding', 37, 49), 'fact', 'Diagnostic finding reference'),
    ('med_07', "The patient's fever spiked overnight. This development concerned the medical team.",
     ("The patient's fever spiked overnight", 0, 36, 'spiked'),
     ('This development', 38, 54), 'event', 'Clinical event reference'),
    ('med_08', 'Chemotherapy was discontinued due to adverse reactions. This decision was made by the oncologist.',
     ('Chemotherapy was discontinued due to adverse reactions', 0, 54, 'discontinued'),
     ('This decision', 56, 69), 'event', 'Treatment decision reference'),
    ('med_nom_01', 'The surgeon consulted a specialist. She recommended immediate intervention.',
     ('a specialist', 23, 35, None),
     ('She', 37, 40), 'nominal', 'Standard nominal coreference (specialist)'),
)

FINANCIAL_CASES = (
    ('fin_01', 'The Fed raised interest rates. This move sent shockwaves through markets.',
     ('The Fed raised interest rates', 0, 29, 'raised'),
     ('This move', 31, 40), 'event', 'Policy decision reference'),
    ('fin_02', 'The merger was approved by regulators. This development boosted investor confidence.',
     ('The merger was approved by regulators', 0, 37, 'approved'),
     ('This development', 39, 55), 'event', 'Regulatory approval reference'),
    ('fin_03', 'Quarterly earnings exceeded expectations. This performance led to a stock rally.',
     ('Quarterly earnings exceeded expectations', 0, 40, 'exceeded'),
     ('This performance', 42, 58), 'event', 'Financial performance reference'),
    ('fin_04', 'The company might default on its loans. This risk has alarmed bondholders.',
     ('The company might default on its loans', 0, 38, 'default'),
     ('This risk', 40, 49), 'proposition', 'Financial risk proposition'),
    ('fin_05', 'Supply chain disruptions are causing inflation. This situation could persist for years.',
     ('Supply chain disruptions are causing inflation', 0, 46, 'causing'),
     ('This situation', 48, 62), 'situation', 'Economic situation reference'),
    ('fin_06', 'The CEO announced a stock buyback program. The announcement pushed shares higher.',
     ('The CEO announced a stock buyback program', 0, 41, 'announced'),
     ('The announcement', 43, 59), 'event', 'Corporate announcement reference'),
    ('fin_07', 'Revenue grew by 15% year-over-year. This growth outpaced analyst forecasts.',
     ('Revenue grew by 15% year-over-year', 0, 34, 'grew'),
     ('This growth', 36, 47), 'event', 'Revenue growth event reference'),
    ('fin_08', 'The acquisition was completed yesterday. This transaction creates the largest retailer.',
     ('The acquisition was completed yesterday', 0, 39, 'completed'),
     ('This transaction', 41, 57), 'event', 'Business transaction reference'),
    ('fin_nom_01', 'The CFO presented the report. She highlighted key metrics.',
     ('The CFO', 0, 7, None),
     ('She', 31, 34), 'nominal', 'Standard nominal coreference (CFO)'),
)

SCIENTIFIC_CASES = (
    ('sci_01', 'The experiment failed to replicate earlier results. This failure suggests methodological issues.',
     ('The experiment failed to replicate earlier results', 0, 50, 'failed'),
     ('This failure', 52, 64), 'event', 'Experimental failure reference'),
    ('sci_02', 'The data shows a correlation between diet and longevity. This finding aligns with previous studies.',
     ('The data shows a correlation between diet and longevity', 0, 55, 'shows'),
     ('This finding', 57, 69), 'fact', 'Scientific finding reference'),
    ('sci_03', 'Quantum entanglement may enable faster communication. If this is possible, it would revolutionize networking.',
     ('Quantum entanglement may enable faster communication', 0, 52, 'enable'),
     ('this', 57, 61), 'proposition', 'Scientific hypothesis reference'),
    ('sci_04', 'The samples were contaminated during transport. This problem invalidated the study.',
     ('The samples were contaminated during transport', 0, 46, 'contaminated'),
     ('This problem', 48, 60), 'event', 'Experimental problem reference'),
    ('sci_05', 'The protein folded incorrectly under high temperatures. This observation was unexpected.',
     ('The protein folded incorrectly under high temperatures', 0, 54, 'folded'),
     ('This observation', 56, 72), 'fact', 'Observational fact reference'),
    ('sci_06', 'The simulation predicted climate warming. This prediction matched observed data.',
     ('The simulation predicted climate warming', 0, 40, 'predicted'),
     ('This prediction', 42, 57), 'fact', 'Model prediction reference'),
    ('sci_07', 'The theory was disproven by new evidence. Despite this setback, research continues.',
     ('The theory was disproven by new evidence', 0, 40, 'disproven'),
     ('this setback', 50, 62), 'event', 'Scientific setback reference'),
    ('sci_08', 'The algorithm achieved 98% accuracy. This result represents state-of-the-art performance.',
     ('The algorithm achieved 98% accuracy', 0, 35, 'achieved'),
     ('This result', 37, 48), 'fact', 'Experimental result reference'),
    ('sci_nom_01', 'The researcher published her findings. She received several awards.',
     ('The researcher', 0, 14, None),
     ('She', 40, 43), 'nominal', 'Standard nominal coreference (researcher)'),
)

NEWS_CASES = (
    ('news_01', 'The president signed the bill into law. This action fulfilled a campaign promise.',
     ('The president signed the bill into law', 0, 38, 'signed'),
     ('This action', 40, 51), 'event', 'Political action reference'),
    ('news_02', 'Protests erupted across major cities. This unrest prompted a government response.',
     ('Protests erupted across major cities', 0, 36, 'erupted'),
     ('This unrest', 38, 49), 'event', 'Social unrest reference'),
    ('news_03', 'The minister denied any wrongdoing. This denial contradicted earlier statements.',
     ('The minister denied any wrongdoing', 0, 34, 'denied'),
     ('This denial', 36, 47), 'event', 'Statement/denial reference'),
    ('news_04', 'Peace talks collapsed after three days. The breakdown disappointed international observers.',
     ('Peace talks collapsed after three days', 0, 38, 'collapsed'),
     ('The breakdown', 40, 53), 'event', 'Diplomatic breakdown reference'),
    ('news_05', 'The hurricane devastated coastal towns. This disaster left thousands homeless.',
     ('The hurricane devastated coastal towns', 0, 38, 'devastated'),
     ('This disaster', 40, 53), 'event', 'Natural disaster reference'),
    ('news_06', 'The celebrity apologized publicly. This apology came after widespread backlash.',
     ('The celebrity apologized publicly', 0, 33, 'apologized'),
     ('This apology', 35, 47), 'event', 'Public apology reference'),
    ('news_07', 'The election results were contested. This controversy led to legal challenges.',
     ('The election results were contested', 0, 35, 'contested'),
     ('This controversy', 37, 53), 'event', 'Political controversy reference'),
    ('news_08', 'Unemployment fell to a historic low. This improvement boosted consumer spending.',
     ('Unemployment fell to a historic low', 0, 35, 'fell'),
     ('This improvement', 37, 53), 'event', 'Economic improvement reference'),
    ('news_nom_01', 'The mayor addressed the media. He promised immediate action.',
     ('The mayor', 0, 9, None),
     ('He', 32, 34), 'nominal', 'Standard nominal coreference (mayor)'),
)

CHALLENGING_CASES = (
    ('chal_01', 'The company reported strong earnings. Analysts praised the results. Investors celebrated. This success was unexpected.',
     ('The company reported strong earnings', 0, 36, 'reported'),
     ('This success', 91, 103), 'event', 'Long-distance (3 sentences back)'),
    ('chal_02', 'This much is clear: the policy has failed.',
     ('the policy has failed', 20, 41, 'failed'),
     ('This much', 0, 9), 'fact', 'Cataphoric reference'),
    ('chal_03', 'Inflation rose while wages stagnated and unemployment increased. This combination created economic hardship.',
     ('Inflation rose while wages stagnated and unemployment increased', 0, 63, None),
     ('This combination', 65, 81), 'situation', 'Multi-clause conjunction antecedent'),
    ('chal_04', 'The CEO said that layoffs were necessary. This claim angered workers.',
     ('layoffs were necessary', 18, 40, None),
     ('This claim', 42, 52), 'proposition', 'Embedded clause antecedent'),
    ('chal_05', 'The witness did not appear in court. This absence was noted by the judge.',
     ('The witness did not appear in court', 0, 35, 'appear'),
     ('This absence', 37, 49), 'event', 'Negated event antecedent'),
    ('chal_06', 'Either the system crashed or data was corrupted. This problem halted operations.',
     ('Either the system crashed or data was corrupted', 0, 47, None),
     ('This problem', 49, 61), 'situation', 'Disjunction antecedent'),
    ('chal_07', 'If interest rates rise, housing prices will fall. This scenario worries homeowners.',
     ('If interest rates rise, housing prices will fall', 0, 48, None),
     ('This scenario', 50, 63), 'proposition', 'Conditional antecedent'),
    ('chal_08', 'Profits are higher than last year. This exceeds expectations.',
     ('Profits are higher than last year', 0, 33, None),
     ('This', 35, 39), 'fact', 'Comparative statement antecedent'),
    ('chal_09', 'Will the company survive? This question haunts investors.',
     ('Will the company survive', 0, 24, None),
     ('This question', 27, 40), 'proposition', 'Interrogative clause antecedent'),
    ('chal_10', 'Power corrupts. This truth has been known for centuries.',
     ('Power corrupts', 0, 14, 'corrupts'),
     ('This truth', 16, 26), 'fact', 'Generic statement antecedent'),
)


_COLLECTIONS = {
    "standard": STANDARD_CASES, "extended": EXTENDED_CASES,
    "legal": LEGAL_CASES, "medical": MEDICAL_CASES,
    "financial": FINANCIAL_CASES, "scientific": SCIENTIFIC_CASES,
    "news": NEWS_CASES, "challenging": CHALLENGING_CASES,
}


def _to_case(row: tuple) -> dict:
    cid, text, ante, ana, atype, notes = row
    return {
        "id": cid, "text": text,
        "antecedent": {"text": ante[0], "start": ante[1], "end": ante[2],
                       "trigger": ante[3]},
        "anaphor": {"text": ana[0], "start": ana[1], "end": ana[2]},
        "anaphora_type": atype, "should_resolve": True, "notes": notes,
    }


def dataset(name: str = "standard") -> list:
    """One collection by name (abstract_anaphora.rs:214-2076)."""
    return [_to_case(r) for r in _COLLECTIONS[name]]


def comprehensive_dataset() -> list:
    """comprehensive() (:2076-2100): extended + the six domain sets.
    (extended() itself embeds the standard cases in the reference; the
    extracted EXTENDED_CASES here are exactly its additions, so the
    union reproduces the reference's case multiset.)"""
    out = dataset("standard") + dataset("extended")
    for name in ("legal", "medical", "financial", "scientific", "news",
                 "challenging"):
        out.extend(dataset(name))
    return out


def dataset_stats(cases: list) -> dict:
    """DatasetStats (:2104-2148)."""
    by = {t: 0 for t in ANAPHORA_TYPES}
    for c in cases:
        by[c["anaphora_type"]] += 1
    return {"total": len(cases), **by,
            "abstract_total": sum(v for k, v in by.items() if k != "nominal")}


# ---------------------------------------------------------------------------
# Spark path

CASES_SCHEMA = (
    "id string, text string, antecedent_text string, antecedent_start long, "
    "antecedent_end long, trigger string, anaphor_text string, "
    "anaphor_start long, anaphor_end long, anaphora_type string"
)

RESULTS_SCHEMA = (
    "case_id string, anaphora_type string, resolved_correctly boolean, "
    "antecedent_found boolean, anaphor_found boolean, failure_reason string"
)


def cases_df(spark, cases: list | None = None):
    rows = [(c["id"], c["text"], c["antecedent"]["text"],
             c["antecedent"]["start"], c["antecedent"]["end"],
             c["antecedent"]["trigger"], c["anaphor"]["text"],
             c["anaphor"]["start"], c["anaphor"]["end"], c["anaphora_type"])
            for c in (cases if cases is not None else comprehensive_dataset())]
    return spark.createDataFrame(rows, CASES_SCHEMA)


def evaluate_df(cases, use_discourse: bool = False):
    """Per-case evaluation in one mapInPandas pass (each case is
    independent per-document work), ready for relational rollups."""
    import pandas as pd

    def run(batches):
        cols = ["case_id", "anaphora_type", "resolved_correctly",
                "antecedent_found", "anaphor_found", "failure_reason"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                case = {
                    "id": r.id, "text": r.text,
                    "antecedent": {"text": r.antecedent_text,
                                   "start": int(r.antecedent_start),
                                   "end": int(r.antecedent_end),
                                   "trigger": r.trigger},
                    "anaphor": {"text": r.anaphor_text,
                                "start": int(r.anaphor_start),
                                "end": int(r.anaphor_end)},
                    "anaphora_type": r.anaphora_type,
                }
                res = (evaluate_case_discourse(case) if use_discourse
                       else evaluate_case(case))
                rows.append((res["case_id"], res["anaphora_type"],
                             res["resolved_correctly"],
                             res["antecedent_found"], res["anaphor_found"],
                             res["failure_reason"]))
            yield pd.DataFrame(rows, columns=cols)

    return cases.mapInPandas(run, schema=RESULTS_SCHEMA)


def accuracy_by_type(results):
    """Nominal/abstract + per-type accuracy as one groupBy table."""
    from pyspark.sql import functions as F

    per_type = results.groupBy("anaphora_type").agg(
        F.count("*").alias("total"),
        F.sum(F.col("resolved_correctly").cast("int")).alias("correct"),
    ).withColumn("accuracy", F.col("correct") / F.col("total"))
    rollup = results.groupBy(
        F.when(F.col("anaphora_type") == "nominal", "nominal")
         .otherwise("abstract").alias("anaphora_type")
    ).agg(
        F.count("*").alias("total"),
        F.sum(F.col("resolved_correctly").cast("int")).alias("correct"),
    ).withColumn("accuracy", F.col("correct") / F.col("total"))
    return per_type.unionByName(rollup)

"""R1 parity tests (anno/src/backends/inference.rs:2014-2163)."""

from anno_spark.core.document import extract_document
from anno_spark.core.entity import Mention
from anno_spark.core.relations import detect_relation_type, extract_relations


def m(text, etype, start, end):
    return Mention(text, etype, start, end, 0.9, "p", "s")


class TestDetect:
    def test_works_for(self):
        hit = detect_relation_type(m("A", "PER", 0, 1), m("B", "ORG", 10, 11), " works for ")
        assert hit[0] == "WORKS_FOR" and hit[1] == 0.7

    def test_founded_is_ceo_of(self):
        # "founded" is a CEO_OF trigger checked before FOUNDED (inference.rs:2097-2110)
        hit = detect_relation_type(m("A", "PER", 0, 1), m("B", "ORG", 10, 11), " founded ")
        assert hit[0] == "CEO_OF" and hit[1] == 0.8

    def test_employment_requires_per_org(self):
        assert detect_relation_type(m("A", "ORG", 0, 1), m("B", "ORG", 10, 11), " works for ") is None

    def test_located_in_requires_tail_loc(self):
        assert detect_relation_type(m("A", "ORG", 0, 1), m("B", "LOC", 10, 11), " based in ")[0] == "LOCATED_IN"
        assert detect_relation_type(m("A", "ORG", 0, 1), m("B", "ORG", 10, 11), " based in ") is None

    def test_bare_in_fires_located_in(self):
        hit = detect_relation_type(m("A", "DATE", 0, 1), m("B", "LOC", 10, 11), " held in ")
        assert hit[0] == "LOCATED_IN" and hit[1] == 0.6

    def test_born_in_shadowed_by_located_in(self):
        # "born in" contains "in" → LOCATED_IN fires first
        hit = detect_relation_type(m("A", "PER", 0, 1), m("B", "LOC", 10, 11), " was born in ")
        assert hit[0] == "LOCATED_IN"

    def test_from_fires_born_in(self):
        hit = detect_relation_type(m("A", "PER", 0, 1), m("B", "LOC", 10, 11), " comes from ")
        assert hit[0] == "BORN_IN" and hit[1] == 0.7

    def test_part_of(self):
        hit = detect_relation_type(m("A", "ORG", 0, 1), m("B", "ORG", 10, 11), " is a subsidiary of ")
        assert hit[0] == "PART_OF"

    def test_trigger_span_offsets(self):
        hit = detect_relation_type(m("A", "PER", 0, 1), m("B", "ORG", 10, 11), "xx works for yy")
        assert hit[2] == (3, 12)  # byte offsets of "works for"


class TestExtract:
    def test_basic_pair(self):
        text = "Alice Wonder works for Acme Corp."
        ents = [m("Alice Wonder", "PER", 0, 12), m("Acme Corp", "ORG", 23, 32)]
        triples = extract_relations(ents, text)
        assert len(triples) == 1
        t = triples[0]
        assert (t.subj_text, t.pred, t.obj_text) == ("Alice Wonder", "WORKS_FOR", "Acme Corp")
        assert text[t.trigger_start : t.trigger_end] == "works for"

    def test_distance_gate(self):
        filler = "x" * 60
        text = f"Alice {filler} works for Acme"
        ents = [m("Alice", "PER", 0, 5), m("Acme", "ORG", len(text) - 4, len(text))]
        assert extract_relations(ents, text) == []

    def test_both_directions_attempted(self):
        # (head=LOC-second, tail=ORG-first) direction: between text is the
        # same; LOCATED_IN requires tail LOC so only one direction fires.
        text = "Acme based in Paris"
        ents = [m("Acme", "ORG", 0, 4), m("Paris", "LOC", 14, 19)]
        triples = extract_relations(ents, text)
        assert len(triples) == 1 and triples[0].subj_text == "Acme"

    def test_end_to_end_document(self):
        text = "Elon Musk founded Tesla Inc. in California."
        out = extract_document(text)
        preds = {(t.subj_text, t.pred, t.obj_text) for t in out.triples}
        assert any(p[1] == "CEO_OF" for p in preds), preds


def test_windowed_pair_scan_equals_naive_loop():
    """The bisect/break windowed scan must emit exactly the triples of
    the full n² ordered-pair loop, in the same order, for random
    mention sets (sorted and unsorted, overlapping and long spans)."""
    import random

    from anno_spark.core.entity import LOC, ORG, PER, Mention
    from anno_spark.core.relations import (
        MAX_SPAN_DISTANCE,
        _byte_slice,
        detect_relation_type,
    )
    from anno_spark.core.relations import extract_relations as windowed

    def naive(entities, text, max_d=MAX_SPAN_DISTANCE):
        out = []
        tb = text.encode("utf-8")
        for i in range(len(entities)):
            head = entities[i]
            for j in range(len(entities)):
                if i == j:
                    continue
                tail = entities[j]
                if head.end <= tail.start:
                    d = tail.start - head.end
                    ss, se = head.end, tail.start
                else:
                    d = max(head.start - tail.end, 0)
                    ss, se = tail.end, head.start
                if d > max_d:
                    continue
                hit = detect_relation_type(head, tail, _byte_slice(tb, ss, se))
                if hit:
                    slug, conf, (ts, te) = hit
                    out.append((head.text, slug, tail.text, ss + ts, ss + te, conf))
        return out

    rng = random.Random(9)
    words = "Alice Bob CEO of Acme Corp in works for Berlin founded and then at the".split()
    # every 3rd trial uses >=64 entities so the WINDOWED scan path runs
    for trial in range(60):
        text = " ".join(rng.choice(words) for _ in range(rng.randrange(5, 60)))
        ents = []
        n_ents = rng.randrange(0, 14) if trial % 3 else rng.randrange(64, 110)
        for _ in range(n_ents):
            s = rng.randrange(0, max(1, len(text) - 2))
            e = min(len(text), s + rng.randrange(1, 30))
            etype = rng.choice([PER, ORG, LOC, "DATE"])
            ents.append(Mention(text[s:e], etype, s, e, 0.9, "t", "x"))
        for sort_it in (True, False):
            es = sorted(ents, key=lambda m: (m.start, m.end)) if sort_it else list(ents)
            got = [
                (t.subj_text, t.pred, t.obj_text, t.trigger_start, t.trigger_end, t.confidence)
                for t in windowed(es, text)
            ]
            assert got == naive(es, text), (trial, sort_it, text)

"""N2/N3 parity tests transcribed from the reference
(tests/cli_integration.rs:70-125, 1205-1260, 1316-1420; heuristic.rs rules)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from anno_spark.core.heuristic_ner import classify_minimal, extract_entities


def find(es, text):
    return next((e for e in es if e.text == text), None)


class TestPersons:
    def test_common_names(self):
        for text in [
            "John Smith is here.",
            "Jane Smith spoke today.",
            "Barack Obama met world leaders.",
        ]:
            es = extract_entities(text)
            assert any(e.entity_type == "PER" for e in es), text

    def test_two_word_name(self):
        es = extract_entities("John Smith works here.")
        m = find(es, "John Smith")
        assert m is not None and m.entity_type == "PER"

    def test_title_single_name(self):
        assert extract_entities("Dr. John said hello.")

    def test_title_two_word_name(self):
        es = extract_entities("Dr. John Smith said hello.")
        assert es and es[0].text == "Dr. John Smith"

    def test_skip_pronoun_at_start(self):
        es = extract_entities("She went home.")
        assert not any(e.text == "She" for e in es)


class TestOrgs:
    def test_known_orgs(self):
        for text in ["Google announced.", "Apple released.", "Microsoft competed."]:
            es = extract_entities(text)
            assert any(e.entity_type == "ORG" for e in es), text

    def test_org_suffix(self):
        es = extract_entities("He joined Acme Corp. last year.")
        m = find(es, "Acme Corp")
        assert m is not None and m.entity_type == "ORG" and m.confidence == 0.85

    def test_org_of_pattern(self):
        es = extract_entities("The Bank of America announced results.")
        m = find(es, "Bank of America")
        assert m is not None and m.entity_type == "ORG" and m.pattern == "org_of_pattern"

    def test_loc_preposition_beats_org_of(self):
        # Rule 6 (loc_context) precedes Rule 8 (org_of_pattern) in the
        # reference cascade (heuristic.rs:721-744).
        es = extract_entities("Funds came from Bank of America yesterday.")
        m = find(es, "Bank of America")
        assert m is not None and m.entity_type == "LOC" and m.pattern == "loc_context"


class TestLocations:
    def test_loc_preposition(self):
        es = extract_entities("She lives in Paris.")
        m = find(es, "Paris")
        assert m is not None and m.entity_type == "LOC"

    def test_known_loc(self):
        es = extract_entities("Meeting in Berlin, Germany.")
        assert any(e.entity_type == "LOC" for e in es)

    def test_place_indicator(self):
        es = extract_entities("They visited New Zealand last month.")
        m = find(es, "New Zealand")
        assert m is not None and m.entity_type == "LOC" and m.confidence == 0.65


class TestSpans:
    def test_leading_punct_stripped(self):
        for text in [".John Smith", "(John Smith)", "[John Smith]"]:
            es = extract_entities(text)
            assert es, text

    def test_offsets_slice_text(self):
        text = "Yesterday John Smith visited Acme Corp. in Paris."
        for e in extract_entities(text):
            assert text[e.start : e.end] == e.text, (e.text, e.start, e.end)

    def test_sentence_starter_skipped(self):
        es = extract_entities("The market closed early.")
        assert not any(e.text.startswith("The") for e in es)

    def test_connector_of(self):
        es = extract_entities("The University of Texas is large.")
        assert find(es, "University of Texas")

    def test_cjk_gazetteer(self):
        es = extract_entities("ソニーは東京にあります")
        orgs = [e for e in es if e.entity_type == "ORG"]
        locs = [e for e in es if e.entity_type == "LOC"]
        assert any(e.text == "ソニー" for e in orgs)
        assert any(e.text == "東京" for e in locs)
        for e in es:
            assert "ソニーは東京にあります"[e.start : e.end] == e.text

    def test_empty(self):
        assert extract_entities("") == []


class TestClassify:
    def test_rule_order(self):
        # org suffix beats known person
        assert classify_minimal(["John", "Inc"], ["John", "Inc"], 0)[0] == "ORG"
        # known org
        assert classify_minimal(["Google"], ["at", "Google"], 1) == ("ORG", 0.80, "known_org")
        # known loc
        assert classify_minimal(["Paris"], ["Paris"], 0) == ("LOC", 0.80, "known_location")
        # known person
        assert classify_minimal(["Elon", "Musk"], ["Elon", "Musk"], 0) == ("PER", 0.75, "common_name")
        # loc context
        assert classify_minimal(["Springfield"], ["in", "Springfield"], 1) == ("LOC", 0.70, "loc_context")
        # two-word default person
        assert classify_minimal(["Foo", "Barbaz"], ["Foo", "Barbaz"], 0) == ("PER", 0.60, "two_word_name")
        # 3+ words → org
        assert classify_minimal(["Aaa", "Bbb", "Ccc"], ["Aaa", "Bbb", "Ccc"], 0) == ("ORG", 0.50, "long_span_org")
        # single sentence-start word below threshold
        assert classify_minimal(["Zzz"], ["Zzz"], 0) == ("PER", 0.30, "single_start_word")
        # single mid-sentence capitalized word
        assert classify_minimal(["Zzz"], ["said", "Zzz"], 1) == ("PER", 0.45, "capitalized")

    @given(st.text(max_size=200))
    @settings(max_examples=150, deadline=None)
    def test_never_raises_offsets_valid(self, text):
        for e in extract_entities(text):
            assert 0 <= e.start <= e.end <= max(len(text), e.end)

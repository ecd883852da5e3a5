"""N1 parity tests transcribed from the reference unit suite
(anno/src/backends/regex.rs:406-933) + hypothesis properties mirroring
regex.rs:963-1046."""

from hypothesis import given, settings
from hypothesis import strategies as st

from anno_spark.core.regex_ner import extract_entities


def types(es):
    return {e.entity_type for e in es}


def find_text(es, t):
    return next((e for e in es if e.text == t), None)


class TestDates:
    def test_iso(self):
        assert find_text(extract_entities("Meeting on 2024-01-15."), "2024-01-15")

    def test_us(self):
        es = extract_entities("Due by 12/31/2024 and 1/5/24.")
        assert sum(1 for e in es if e.entity_type == "DATE") == 2

    def test_eu(self):
        assert find_text(extract_entities("Released on 31.12.2024."), "31.12.2024")

    def test_written_full(self):
        for case in ["January 15, 2024", "February 28", "March 1st, 2024", "December 25th"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_written_short(self):
        for case in ["Jan 15, 2024", "Feb 28", "Mar. 1st", "Dec 25th, 2024"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_eu_written(self):
        for case in ["15 January 2024", "28th February", "1st March 2024"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_japanese(self):
        for case in ["2024年1月15日", "2024年12月31日", "2000年01月01日"]:
            es = extract_entities(case)
            assert "DATE" in types(es), case
            assert es[0].text == case

    def test_korean(self):
        for case in ["2024년 1월 15일", "2024년 12월 31일"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_german(self):
        for text, expected in [
            ("15. Januar 2024", "15. Januar 2024"),
            ("3 März 2023", "3 März 2023"),
            ("25 Dezember", "25 Dezember"),
        ]:
            es = extract_entities(text)
            assert "DATE" in types(es), text
            assert find_text(es, expected), text

    def test_french(self):
        for case in ["15 janvier 2024", "1er février 2023", "25 décembre"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_spanish(self):
        for case in ["15 de enero de 2024", "5 marzo 2023", "25 diciembre"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_other_languages(self):
        for case in ["15 gennaio 2024", "15 de janeiro de 2024", "15 januari 2024", "15 января 2024"]:
            assert "DATE" in types(extract_entities(case)), case

    def test_multilingual_in_context(self):
        es = extract_entities("Meeting on 2024年1月15日 at the office. Follow-up on 15 janvier.")
        assert sum(1 for e in es if e.entity_type == "DATE") == 2


class TestTimes:
    def test_12h(self):
        for case in ["3:30 PM", "10:00 am", "12:30:45 p.m.", "9:00 AM"]:
            assert "TIME" in types(extract_entities(case)), case

    def test_24h(self):
        for case in ["14:30", "09:00", "23:59:59", "0:00"]:
            assert "TIME" in types(extract_entities(case)), case

    def test_simple(self):
        for case in ["3pm", "10 AM", "9 a.m."]:
            assert "TIME" in types(extract_entities(case)), case


class TestMoney:
    def test_dollar(self):
        for case in ["$100", "$1,000", "$99.99", "$1,234,567.89"]:
            assert "MONEY" in types(extract_entities(case)), case

    def test_magnitude(self):
        for case in ["$5 million", "$1.5B", "$100K", "$2 billion"]:
            assert "MONEY" in types(extract_entities(case)), case

    def test_currencies(self):
        for case in ["€500", "£100", "¥1000"]:
            assert "MONEY" in types(extract_entities(case)), case

    def test_written(self):
        for case in ["50 dollars", "100 USD", "500 euros", "1000 EUR", "200 pounds"]:
            assert "MONEY" in types(extract_entities(case)), case

    def test_magnitude_written(self):
        for case in ["5 billion dollars", "1.5 million euros", "100 million"]:
            assert "MONEY" in types(extract_entities(case)), case

    def test_unicode_char_offsets(self):
        # regex.rs:546-574 regression: char offsets, not bytes
        es = [e for e in extract_entities("Price: €50 then €100") if e.entity_type == "MONEY"]
        assert len(es) == 2
        assert (es[0].start, es[0].end) == (7, 10)
        assert (es[1].start, es[1].end) == (16, 20)


class TestOther:
    def test_percent(self):
        for case in ["15%", "3.5%", "100%", "0.01%", "15 percent", "50 pct"]:
            assert "PERCENT" in types(extract_entities(case)), case

    def test_email(self):
        for case in ["user@example.com", "john.doe@company.org", "support+ticket@help.co.uk", "test_123@sub.domain.io"]:
            assert "EMAIL" in types(extract_entities(case)), case

    def test_url(self):
        for case in ["https://example.com", "http://www.google.com", "https://sub.domain.co.uk/path?query=1", "http://localhost:8080/api"]:
            assert "URL" in types(extract_entities(case)), case

    def test_phone_us(self):
        for case in ["(555) 123-4567", "555-123-4567", "555.123.4567", "1-555-123-4567", "+1 555 123 4567"]:
            assert "PHONE" in types(extract_entities(case)), case

    def test_phone_intl(self):
        for case in ["+44 20 7946 0958", "+81 3 1234 5678"]:
            assert "PHONE" in types(extract_entities(case)), case


class TestIntegration:
    def test_mixed(self):
        es = extract_entities(
            "Meeting on Jan 15 at 3:30 PM. Cost: $500. Contact: bob@acme.com "
            "or (555) 123-4567. Completion: 75%."
        )
        for t in ("DATE", "TIME", "MONEY", "PERCENT", "EMAIL", "PHONE"):
            assert t in types(es), t

    def test_no_per_org_loc(self):
        es = extract_entities("John Smith works at Google in New York.")
        assert not types(es) & {"PER", "ORG", "LOC"}

    def test_sorted(self):
        starts = [e.start for e in extract_entities("$100 on 2024-01-01 at 50%")]
        assert starts == sorted(starts)

    def test_no_overlap(self):
        es = extract_entities("The price is $1,000,000 (1 million dollars).")
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                assert not (es[i].start < es[j].end and es[j].start < es[i].end)

    def test_empty(self):
        assert extract_entities("") == []

    def test_no_entities(self):
        assert extract_entities("The quick brown fox jumps over the lazy dog.") == []

    def test_spans_slice_text(self):
        text = "Cost: $100"
        m = find_text(extract_entities(text), "$100")
        assert text[m.start : m.end] == "$100"

    def test_provenance(self):
        es = extract_entities("Contact: test@email.com on 2024-01-15")
        assert find_text(es, "test@email.com").pattern == "EMAIL"
        assert find_text(es, "2024-01-15").pattern == "DATE_ISO"

    def test_confidences(self):
        es = extract_entities("2024-01-15 3:30 PM $100 15% a@b.co https://x.io (555) 123-4567")
        by_type = {e.entity_type: e.confidence for e in es}
        assert by_type["DATE"] == 0.95
        assert by_type["TIME"] == 0.90
        assert by_type["MONEY"] == 0.95
        assert by_type["PERCENT"] == 0.95
        assert by_type["EMAIL"] == 0.98
        assert by_type["URL"] == 0.98
        assert by_type["PHONE"] == 0.85

    def test_mention_hashtag(self):
        es = extract_entities("ping @alice.b and #spark today")
        assert find_text(es, "@alice.b").entity_type == "Mention"
        assert find_text(es, "#spark").entity_type == "Hashtag"

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_never_raises_offsets_in_bounds_no_overlap(self, text):
        # regex.rs:963-1046 proptest mirror
        es = extract_entities(text)
        for e in es:
            assert 0 <= e.start < e.end <= len(text)
            assert text[e.start : e.end] == e.text
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                assert not (es[i].start < es[j].end and es[j].start < es[i].end)
        assert [e.start for e in es] == sorted(e.start for e in es)


def test_guards_never_change_output():
    """The pre-scan guards must be strictly implied by their patterns:
    guarded extraction == running every pattern unguarded, on a fuzz
    corpus covering every guard character class."""
    import random

    from anno_spark.core.regex_ner import _PASSES, Mention, _overlaps, extract_entities

    def unguarded(text):
        entities = []
        for pattern, etype, conf, name in _PASSES:
            for m in pattern.finditer(text):
                s, e = m.start(), m.end()
                if not _overlaps(entities, s, e):
                    entities.append(Mention(m.group(), etype, s, e, conf, name, "regex"))
        entities.sort(key=lambda e: e.start)
        return entities

    rng = random.Random(42)
    pieces = [
        "2024-01-15", "3/4/99", "1.2.2024", "March 5th, 2020", "5 janvier",
        "12:30 pm", "14:05", "3pm", "$5,000", "€9", "£3M", "¥100",
        "500 dollars", "2 billion", "55%", "12 pct", "a@b.co",
        "https://x.test/a", "+49 30 1234", "(555) 123-4567", "@handle",
        "#tag", "2024年1月5日", "2024년 1월 5일", "plain words only",
        "Mr. Smith", "no digits here at all", "$,",
    ]
    for _ in range(400):
        text = " ".join(rng.choice(pieces) for _ in range(rng.randrange(0, 8)))
        got = [(m.text, m.start, m.end, m.pattern) for m in extract_entities(text)]
        want = [(m.text, m.start, m.end, m.pattern) for m in unguarded(text)]
        assert got == want, text

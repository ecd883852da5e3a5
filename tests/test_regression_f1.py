"""E5 — F1 regression floors (reference tests/regression_f1.rs:26-42).

These fail CI when an NER pattern regresses. Test cases and floors are
transcribed from the reference suite (regression_f1.rs:47-130, constants
at :26-42): structured ≥ .85, dates ≥ .70, money ≥ .50, email ≥ .95,
stacked-mixed ≥ .40. Scoring is the reference's strict mode — exact
(start, end, type) 1-1 matching, micro-averaged over all cases.

Pure Python (no Spark): the floors gate the UDF payload itself.
"""

from __future__ import annotations


def _gold(text: str, etype: str, start: int) -> tuple[int, int, str]:
    return (start, start + len(text), etype)


STRUCTURED_CASES = [
    # dates (regression_f1.rs:50-63)
    ("Meeting on 2024-01-15 at noon.", [_gold("2024-01-15", "DATE", 11)]),
    ("Deadline: January 15, 2024", [_gold("January 15, 2024", "DATE", 10)]),
    ("Due by 12/31/2024", [_gold("12/31/2024", "DATE", 7)]),
    # money (:64-77)
    ("Price: $100.00 each", [_gold("$100.00", "MONEY", 7)]),
    ("Total: €50.99", [_gold("€50.99", "MONEY", 7)]),
    ("Budget of $1,000,000", [_gold("$1,000,000", "MONEY", 10)]),
    # percent (:78-86)
    ("Growth of 25%", [_gold("25%", "PERCENT", 10)]),
    ("Rate: 3.5%", [_gold("3.5%", "PERCENT", 6)]),
    # email (:87-99)
    ("Contact: john@example.com", [_gold("john@example.com", "EMAIL", 9)]),
    (
        "Email test.user+tag@sub.domain.co.uk",
        [_gold("test.user+tag@sub.domain.co.uk", "EMAIL", 6)],
    ),
    # url (:100-107)
    ("Visit https://example.com/path", [_gold("https://example.com/path", "URL", 6)]),
    # phone (:108-112)
    ("Call 555-123-4567", [_gold("555-123-4567", "PHONE", 5)]),
]

MIXED_CASES = [
    (
        "Apple reported $50B revenue on Jan 15, 2024.",
        [
            _gold("Apple", "ORG", 0),
            _gold("$50B", "MONEY", 15),
            _gold("Jan 15, 2024", "DATE", 31),
        ],
    ),
    (
        "Email ceo@company.com for the meeting at 3pm.",
        [_gold("ceo@company.com", "EMAIL", 6)],
    ),
    (
        "Dr. Smith charges $200/hour.",
        [_gold("Dr. Smith", "PER", 0), _gold("$200", "MONEY", 18)],
    ),
]

DATE_CASES = [
    ("Date: 2024-01-15", [_gold("2024-01-15", "DATE", 6)]),
    ("On January 15, 2024", [_gold("January 15, 2024", "DATE", 3)]),
    ("Due 12/31/2024", [_gold("12/31/2024", "DATE", 4)]),
    ("March 2024 report", [_gold("March 2024", "DATE", 0)]),
]

MONEY_CASES = [
    ("Cost: $100", [_gold("$100", "MONEY", 6)]),
    ("USD $50.99 total", [_gold("$50.99", "MONEY", 4)]),
    ("Budget $1,000,000", [_gold("$1,000,000", "MONEY", 7)]),
    ("Fee: $25", [_gold("$25", "MONEY", 5)]),
]

EMAIL_CASES = [
    ("Email: test@example.com", [_gold("test@example.com", "EMAIL", 7)]),
    ("Contact user.name@domain.org", [_gold("user.name@domain.org", "EMAIL", 8)]),
    ("Send to admin@company.co.uk", [_gold("admin@company.co.uk", "EMAIL", 8)]),
]


def _strict_f1(extract, cases, drop_type: str | None = None) -> float:
    """Micro strict F1: exact (start, end, type) 1-1 matching."""
    n_pred = n_gold = n_match = 0
    for text, golds in cases:
        preds = [
            (m.start, m.end, m.entity_type)
            for m in extract(text)
            if m.entity_type != drop_type
        ]
        n_pred += len(preds)
        n_gold += len(golds)
        gold_left = list(golds)
        for p in preds:
            if p in gold_left:
                gold_left.remove(p)
                n_match += 1
    p = n_match / n_pred if n_pred else 0.0
    r = n_match / n_gold if n_gold else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0


class TestF1Floors:
    def test_regex_structured_floor(self):
        from anno_spark.core.regex_ner import extract_entities

        f1 = _strict_f1(extract_entities, STRUCTURED_CASES)
        assert f1 >= 0.85, f"RegexNER structured F1 regression: {f1:.3f} < 0.85"

    def test_regex_dates_floor(self):
        from anno_spark.core.regex_ner import extract_entities

        f1 = _strict_f1(extract_entities, DATE_CASES)
        assert f1 >= 0.70, f"RegexNER date F1 regression: {f1:.3f} < 0.70"

    def test_regex_money_floor(self):
        from anno_spark.core.regex_ner import extract_entities

        f1 = _strict_f1(extract_entities, MONEY_CASES)
        assert f1 >= 0.50, f"RegexNER money F1 regression: {f1:.3f} < 0.50"

    def test_regex_email_floor(self):
        from anno_spark.core.regex_ner import extract_entities

        f1 = _strict_f1(extract_entities, EMAIL_CASES)
        assert f1 >= 0.95, f"RegexNER email F1 regression: {f1:.3f} < 0.95"

    def test_stacked_mixed_floor(self):
        from anno_spark.core.stacked import extract_entities

        f1 = _strict_f1(extract_entities, MIXED_CASES)
        assert f1 >= 0.40, f"StackedNER mixed F1 regression: {f1:.3f} < 0.40"

    def test_floor_detects_broken_pattern(self):
        """Mutation check: silencing the EMAIL pattern must breach its
        floor — proves the gate actually bites on a regression."""
        from anno_spark.core.regex_ner import extract_entities

        f1 = _strict_f1(extract_entities, EMAIL_CASES, drop_type="EMAIL")
        assert f1 < 0.95

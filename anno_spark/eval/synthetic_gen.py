"""Template-generated test data with automatic offsets.

Behavioral port of the reference generator (reference:
anno/src/eval/synthetic_gen.rs:1-350): ``{TYPE}`` placeholders expand
to default (or custom) entity values with offsets computed during
substitution — no hand-coded offsets to get wrong, complementing the
hand-annotated corpora.

Reference quirks preserved:

* Only the FIRST value of each type is substituted
  ("for simplicity, just use first value", synthetic_gen.rs:135-140) —
  the value lists beyond index 0 exist but are unused by generation.
* Unknown types render as a literal ``[TYPE]`` token (rs:100-101).
* A placeholder with no closing brace is ignored and scanning
  continues (rs:185-209).

Cases come back as :class:`anno_spark.eval.report.TestCase`, so they
feed the report builder and harness directly.
"""

from __future__ import annotations

from anno_spark.eval.report import TestCase

__all__ = ["Template", "default_values", "generate_test_cases",
           "standard_test_set", "test_set_for_types"]

_DEFAULT_VALUES = {
    "DATE": ["January 15, 2024", "March 3rd", "2024-01-01", "December 25"],
    "TIME": ["3:00 PM", "14:30", "noon", "9 AM"],
    "EMAIL": ["user@example.com", "test.email@domain.org", "hello@world.io"],
    "MONEY": ["$1,234.56", "€500", "$99.99", "£1,000"],
    "CURRENCY": ["$1,234.56", "€500", "$99.99", "£1,000"],
    "PHONE": ["555-1234", "(555) 123-4567", "+1-800-555-0123"],
    "URL": ["https://example.com", "http://test.org/page", "www.domain.io"],
    "PERSON": ["John Smith", "María García", "李明", "Dr. Jane Doe"],
    "PER": ["John Smith", "María García", "李明", "Dr. Jane Doe"],
    "ORGANIZATION": ["Google", "Microsoft Corporation", "United Nations"],
    "ORG": ["Google", "Microsoft Corporation", "United Nations"],
    "LOCATION": ["New York", "Tokyo", "London, UK"],
    "LOC": ["New York", "Tokyo", "London, UK"],
    "GPE": ["New York", "Tokyo", "London, UK"],
}


def default_values(entity_type: str) -> list:
    """Per-type value pools (synthetic_gen.rs:54-102)."""
    return list(_DEFAULT_VALUES.get(entity_type, [f"[{entity_type}]"]))


class Template:
    """{TYPE}-placeholder template (synthetic_gen.rs:25-51)."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.custom_values: dict = {}

    def with_values(self, entity_type: str, values: list) -> "Template":
        self.custom_values[entity_type] = list(values)
        return self


def _parse_placeholders(pattern: str) -> list:
    """(type, start, end) per placeholder; unterminated braces skipped
    (synthetic_gen.rs:179-215)."""
    results = []
    i = 0
    while i < len(pattern):
        if pattern[i] == "{":
            j = pattern.find("}", i + 1)
            if j != -1:
                results.append((pattern[i + 1:j], i, j + 1))
                i = j + 1
                continue
        i += 1
    return results


def generate_test_cases(templates: list) -> list:
    """One case per template, first value per type (rs:109-176)."""
    cases = []
    for template in templates:
        placeholders = _parse_placeholders(template.pattern)
        if not placeholders:
            cases.append(TestCase(template.pattern, []))
            continue
        text = template.pattern
        entities = []
        offset_adjustment = 0
        for (entity_type, ph_start, ph_end) in placeholders:
            values = template.custom_values.get(
                entity_type, default_values(entity_type))
            if not values:
                continue
            value = values[0]
            adjusted_start = ph_start + offset_adjustment
            ph_len = ph_end - ph_start
            text = (text[:adjusted_start] + value
                    + text[adjusted_start + ph_len:])
            entities.append((value, entity_type, adjusted_start,
                             adjusted_start + len(value)))
            offset_adjustment += len(value) - ph_len
        cases.append(TestCase(text, entities))
    return cases


def standard_test_set() -> list:
    """Built-in template battery (synthetic_gen.rs:220-245)."""
    templates = [
        Template("Meeting scheduled for {DATE} at {TIME}"),
        Template("Deadline: {DATE}"),
        Template("Call at {TIME}"),
        Template("Email: {EMAIL}"),
        Template("Contact {EMAIL} for more info"),
        Template("Phone: {PHONE}"),
        Template("Total: {MONEY}"),
        Template("Budget approved for {MONEY}"),
        Template("Invoice amount: {MONEY} due {DATE}"),
        Template("Visit {URL} for details"),
        Template("Link: {URL}"),
        Template("{PERSON} works at {ORG}"),
        Template("CEO of {ORG}"),
        Template("Located in {LOC}"),
    ]
    return generate_test_cases(templates)


def test_set_for_types(types: list) -> list:
    """One 'Test {TYPE}' template per requested type (rs:247-257)."""
    return generate_test_cases([Template(f"Test {{{t}}}") for t in types])

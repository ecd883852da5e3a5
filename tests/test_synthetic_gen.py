"""Template generator: auto-offset correctness + report-builder tie-in.

Reference: anno/src/eval/synthetic_gen.rs tests."""

from __future__ import annotations

import pytest

from anno_spark.eval import synthetic_gen as G


def test_simple_template():
    cases = G.generate_test_cases([G.Template("Email: {EMAIL}")])
    assert len(cases) == 1
    c = cases[0]
    assert c.text == "Email: user@example.com"
    assert c.gold_entities == [("user@example.com", "EMAIL", 7, 23)]


def test_multi_placeholder_offsets():
    cases = G.generate_test_cases(
        [G.Template("Meeting scheduled for {DATE} at {TIME}")])
    c = cases[0]
    assert c.text == "Meeting scheduled for January 15, 2024 at 3:00 PM"
    for (etext, _ty, s, e) in c.gold_entities:
        assert c.text[s:e] == etext


def test_custom_values():
    t = G.Template("Contact: {EMAIL}").with_values("EMAIL", ["a@b.co"])
    c = G.generate_test_cases([t])[0]
    assert c.text == "Contact: a@b.co"
    assert c.gold_entities[0][0] == "a@b.co"


def test_first_value_only_quirk():
    # only values[0] is ever used (synthetic_gen.rs:135-140)
    c = G.generate_test_cases([G.Template("On {DATE}")])[0]
    assert "January 15, 2024" in c.text
    assert "March 3rd" not in c.text


def test_unknown_type_literal():
    c = G.generate_test_cases([G.Template("A {WIDGET} here")])[0]
    assert c.text == "A [WIDGET] here"
    assert c.gold_entities[0][:2] == ("[WIDGET]", "WIDGET")


def test_no_placeholders_and_unterminated():
    cases = G.generate_test_cases([G.Template("Plain text"),
                                   G.Template("Broken {DATE here")])
    assert cases[0].gold_entities == []
    assert cases[1].text == "Broken {DATE here"  # unterminated ignored
    assert cases[1].gold_entities == []


def test_standard_test_set_offsets_all_valid():
    cases = G.standard_test_set()
    assert len(cases) == 14
    for c in cases:
        for (etext, _ty, s, e) in c.gold_entities:
            assert c.text[s:e] == etext, c.text


def test_test_set_for_types():
    cases = G.test_set_for_types(["EMAIL", "MONEY"])
    assert len(cases) == 2
    assert cases[0].gold_entities[0][1] == "EMAIL"
    assert cases[1].gold_entities[0][1] == "MONEY"


def test_feeds_report_builder():
    from anno_spark.core import regex_ner
    from anno_spark.eval import report as R

    rep = R.ReportBuilder("regex").with_test_data(
        G.standard_test_set()).build(regex_ner.extract_entities)
    # regex tier nails the structured templates
    assert rep.core["recall"] > 0.4
    assert rep.per_type["EMAIL"]["recall"] == 1.0

"""Entity-list utilities — reference tests transcribed
(anno/src/types/ext.rs:163-268)."""

from __future__ import annotations

import pytest

from anno_spark.core import entity_ext as X
from anno_spark.core.entity import Mention


def _sample():
    return [
        Mention("John", "PER", 0, 4, 0.9, "t", "t"),
        Mention("$100", "MONEY", 10, 14, 0.95, "t", "t"),
        Mention("Paris", "LOC", 20, 25, 0.7, "t", "t"),
        Mention("2024", "DATE", 30, 34, 0.85, "t", "t"),
    ]


def test_above_confidence():
    assert len(X.above_confidence(_sample(), 0.85)) == 3


def test_of_type():
    people = X.of_type(_sample(), "PER")
    assert [e.text for e in people] == ["John"]


def test_has_overlaps():
    assert not X.has_overlaps(_sample())
    overlapping = [Mention("New York", "LOC", 0, 8, 0.9, "t", "t"),
                   Mention("York", "LOC", 4, 8, 0.8, "t", "t")]
    assert X.has_overlaps(overlapping)
    assert len(X.overlapping_pairs(overlapping)) == 1


def test_sorts():
    s = X.sorted_by_confidence(_sample())
    assert [e.text for e in s[:2]] == ["$100", "John"]
    rev = list(reversed(_sample()))
    p = X.sorted_by_position(rev)
    assert [e.text for e in p[:2]] == ["John", "$100"]


def test_highest_and_mean():
    ents = _sample()
    assert X.highest_confidence(ents).text == "$100"
    assert X.mean_confidence(ents) == pytest.approx(0.85)
    assert X.highest_confidence([]) is None
    assert X.mean_confidence([]) is None


def test_highest_confidence_tie_keeps_last():
    # Rust max_by returns the last maximal element
    a = Mention("a", "PER", 0, 1, 0.9, "t", "t")
    b = Mention("b", "PER", 2, 3, 0.9, "t", "t")
    assert X.highest_confidence([a, b]) is b


def test_group_by_type():
    groups = X.group_by_type(_sample())
    assert len(groups["PER"]) == 1
    assert len(groups["MONEY"]) == 1


def test_position_queries():
    ents = _sample()
    assert X.contains_position(ents, 2)
    assert not X.contains_position(ents, 5)
    assert X.at_position(ents, 12).text == "$100"
    assert X.at_position(ents, 5) is None


def test_named_and_structured():
    ents = _sample()
    assert len(X.named_only(ents)) == 2       # John, Paris
    assert len(X.structured_only(ents)) == 2  # $100, 2024


def test_empty_handles_gracefully():
    assert not X.has_overlaps([])
    assert X.overlapping_pairs([]) == []
    assert X.group_by_type([]) == {}

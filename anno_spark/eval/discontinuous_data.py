"""Synthetic discontinuous-NER gold corpus — transcribed reference data
(anno/src/eval/dataset/synthetic/discontinuous.rs:58-355).

Each example: (text, entities, difficulty, domain); each entity is the
dict shape :mod:`anno_spark.eval.discontinuous` consumes:
{"spans": [[s, e], ...], "entity_type": str, "text": str}.
"""

from __future__ import annotations


def _g(spans, entity_type, text):
    return {"spans": [list(s) for s in spans], "entity_type": entity_type, "text": text}


def dataset() -> list:
    """discontinuous.rs:58-76 — easy + medium + hard + biomedical + legal."""
    return (
        _easy_coordination()
        + _medium_coordination()
        + _hard_structures()
        + _biomedical_domain()
        + _legal_domain()
    )


def _easy_coordination() -> list:
    """discontinuous.rs:80-146."""
    return [
        ("New York and Los Angeles airports have increased security.",
         [_g([(0, 8), (25, 33)], "LOC", "New York airports"),
          _g([(13, 24), (25, 33)], "LOC", "Los Angeles airports")],
         "Easy", "General"),
        ("Apple and Microsoft stocks rose sharply.",
         [_g([(0, 5), (20, 26)], "ORG", "Apple stocks"),
          _g([(10, 19), (20, 26)], "ORG", "Microsoft stocks")],
         "Easy", "General"),
        ("John and Mary Smith attended the conference.",
         [_g([(0, 4), (14, 19)], "PER", "John Smith"),
          _g([(9, 13), (14, 19)], "PER", "Mary Smith")],
         "Easy", "General"),
        ("The red and blue cars were parked outside.",
         [_g([(4, 7), (17, 21)], "MISC", "red cars"),
          _g([(12, 16), (17, 21)], "MISC", "blue cars")],
         "Easy", "General"),
    ]


def _medium_coordination() -> list:
    """discontinuous.rs:149-201."""
    return [
        ("Paris, London, and Berlin museums are world-renowned.",
         [_g([(0, 5), (27, 34)], "LOC", "Paris museums"),
          _g([(7, 13), (27, 34)], "LOC", "London museums"),
          _g([(19, 25), (27, 34)], "LOC", "Berlin museums")],
         "Medium", "General"),
        ("CEO and CFO positions at Google and Meta are highly competitive.",
         [_g([(0, 3), (14, 23)], "MISC", "CEO positions"),
          _g([(8, 11), (14, 23)], "MISC", "CFO positions"),
          _g([(27, 33)], "ORG", "Google"),
          _g([(38, 42)], "ORG", "Meta")],
         "Medium", "General"),
        ("The first, second, and third quarters of 2024 showed growth.",
         [_g([(4, 9), (32, 40), (44, 48)], "DATE", "first quarters of 2024"),
          _g([(11, 17), (32, 40), (44, 48)], "DATE", "second quarters of 2024"),
          _g([(23, 28), (32, 40), (44, 48)], "DATE", "third quarters of 2024")],
         "Medium", "General"),
    ]


def _hard_structures() -> list:
    """discontinuous.rs:204-246."""
    return [
        ("North and South American countries signed the treaty.",
         [_g([(0, 5), (16, 24), (25, 34)], "LOC", "North American countries"),
          _g([(10, 15), (16, 24), (25, 34)], "LOC", "South American countries")],
         "Hard", "General"),
        ("Sections 2(a), 3(b), and 4(c) of the agreement shall apply.",
         [_g([(0, 8), (9, 13), (31, 48)], "MISC", "Sections 2(a) of the agreement"),
          _g([(0, 8), (15, 19), (31, 48)], "MISC", "Sections 3(b) of the agreement"),
          _g([(0, 8), (25, 29), (31, 48)], "MISC", "Sections 4(c) of the agreement")],
         "Hard", "Legal"),
    ]


def _biomedical_domain() -> list:
    """discontinuous.rs:249-317."""
    return [
        ("The left and right ventricle showed abnormal function.",
         [_g([(4, 8), (19, 28)], "ANATOMY", "left ventricle"),
          _g([(13, 18), (19, 28)], "ANATOMY", "right ventricle")],
         "Easy", "Biomedical"),
        ("Pain in the upper and lower back was reported.",
         [_g([(12, 17), (28, 32)], "SYMPTOM", "upper back"),
          _g([(22, 27), (28, 32)], "SYMPTOM", "lower back")],
         "Easy", "Biomedical"),
        ("Aspirin and ibuprofen tablets were administered.",
         [_g([(0, 7), (20, 27)], "DRUG", "Aspirin tablets"),
          _g([(12, 21), (20, 27)], "DRUG", "ibuprofen tablets")],
         "Easy", "Biomedical"),
        ("Type 1 and type 2 diabetes mellitus require different treatments.",
         [_g([(0, 6), (18, 35)], "DISEASE", "Type 1 diabetes mellitus"),
          _g([(11, 17), (18, 35)], "DISEASE", "type 2 diabetes mellitus")],
         "Medium", "Biomedical"),
    ]


def _legal_domain() -> list:
    """discontinuous.rs:320-355."""
    return [
        ("Paragraphs 5 and 7 of Article III shall govern.",
         [_g([(0, 10), (11, 12), (19, 33)], "LEGAL_REF", "Paragraphs 5 of Article III"),
          _g([(0, 10), (17, 18), (19, 33)], "LEGAL_REF", "Paragraphs 7 of Article III")],
         "Medium", "Legal"),
        ("The plaintiff and defendant counsel filed motions.",
         [_g([(4, 13), (28, 35)], "LEGAL_ROLE", "plaintiff counsel"),
          _g([(18, 27), (28, 35)], "LEGAL_ROLE", "defendant counsel")],
         "Easy", "Legal"),
    ]


def stats() -> dict:
    """discontinuous.rs:358-376."""
    examples = dataset()
    total_entities = sum(len(ents) for _t, ents, _d, _dom in examples)
    disc = sum(
        1
        for _t, ents, _d, _dom in examples
        for e in ents
        if len(e["spans"]) > 1
    )
    return {
        "total_examples": len(examples),
        "total_entities": total_entities,
        "discontinuous_entities": disc,
        "contiguous_entities": total_entities - disc,
    }

"""Gender-bias eval + eval-side resolver (reference:
anno/src/eval/gender_bias.rs, coref_resolver.rs).

Layers: transcribed resolver unit tests (coref_resolver.rs:479-560),
transcribed bias-harness tests (gender_bias.rs:915-1062) against the
ported SimpleCorefResolver, a pure-python transcription differential
of evaluate_resolver()'s aggregation, the occupation_stereotype
substring quirks, and pinned behavior of the ENGINE resolver on the
same templates (its honest bias measurement).
"""

from __future__ import annotations

import pytest

from anno_spark.eval.coref_resolver import (
    CorefConfig,
    infer_gender,
    is_pronoun,
    names_match,
    pronoun_compatible,
    resolve,
)
from anno_spark.eval.gender_bias import (
    FEMALE_TEMPLATES,
    MALE_TEMPLATES,
    create_comprehensive_bias_templates,
    create_neopronoun_templates,
    create_winobias_templates,
    occupation_stereotype,
)


# ------------------------------------------------ resolver (transcribed)


def test_exact_match():
    # coref_resolver.rs:494-501
    ids = resolve([("John Smith", "PER"), ("John Smith", "PER")])
    assert ids[0] == ids[1]


def test_substring_match():
    # coref_resolver.rs:503-510
    ids = resolve([("John Smith", "PER"), ("Smith", "PER")])
    assert ids[0] == ids[1]


def test_pronoun_resolution():
    # coref_resolver.rs:512-519
    ids = resolve([("John Smith", "PER"), ("he", "PER")])
    assert ids[0] == ids[1]


def test_different_entities():
    # coref_resolver.rs:521-528
    ids = resolve([("John Smith", "PER"), ("Jane Doe", "PER")])
    assert ids[0] != ids[1]


def test_type_matters():
    # coref_resolver.rs:530+ — same surface, different type: no match
    ids = resolve([("Apple", "ORG"), ("Apple", "LOC")])
    assert ids[0] != ids[1]


def test_no_gender_from_names():
    """The design principle (coref_resolver.rs:222-233): 'she' resolves
    to the nearest person even named 'John' — gender is never inferred
    from names."""
    ids = resolve([("John", "PER"), ("she", "PER")])
    assert ids[0] == ids[1]


def test_neopronouns_recognized():
    for p in ("xe", "ze", "ey", "fae", "xyr", "zirself", "faer", "emself"):
        assert is_pronoun(p), p
        assert infer_gender(p) == "n", p
        assert pronoun_compatible(p, "PER"), p
        assert not pronoun_compatible(p, "ORG"), p


def test_pronoun_type_compatibility():
    # orgs: it / collective they; locations: it only
    assert pronoun_compatible("they", "ORG")
    assert pronoun_compatible("it", "ORG")
    assert not pronoun_compatible("he", "ORG")
    assert pronoun_compatible("it", "LOC")
    assert not pronoun_compatible("they", "LOC")
    # unknown types behave like locations (coref_resolver.rs:364)
    assert pronoun_compatible("it", "DATE")
    assert not pronoun_compatible("they", "DATE")


def test_last_name_match_rule():
    assert names_match("PER:john smith", "PER:smith")
    assert names_match("PER:smith", "PER:john smith")
    assert not names_match("PER:john smith", "ORG:smith")
    # substring in the middle also matches (contains, not just last name)
    assert names_match("PER:mary ann lee", "PER:ann")


def test_pronoun_distance_limit():
    """max_pronoun_distance*10 previous entities are scanned
    (coref_resolver.rs:250-254)."""
    fillers = [(f"Org{i}", "ORG") for i in range(35)]
    ids = resolve([("John Smith", "PER")] + fillers + [("he", "PER")])
    # John is 36 entities back — beyond the 30-entity window
    assert ids[-1] != ids[0]
    ids2 = resolve(
        [("John Smith", "PER")] + fillers[:25] + [("he", "PER")],
        CorefConfig(),
    )
    assert ids2[-1] == ids2[0]


# ----------------------------------------------- templates (transcribed)


def test_occupation_stereotype():
    # gender_bias.rs:920-931
    assert occupation_stereotype("nurse") == "Feminine"
    assert occupation_stereotype("engineer") == "Masculine"
    assert occupation_stereotype("artist") is None


def test_occupation_stereotype_substring_quirks():
    """Substring matching quirks (gender_bias.rs:157-165): template-
    grouping and the utility disagree on several occupations."""
    assert occupation_stereotype("preschool teacher") == "Feminine"
    assert occupation_stereotype("construction worker") == "Masculine"
    for none_occ in (
        "social worker", "dental assistant", "veterinary technician",
        "pilot", "architect", "scientist", "firefighter", "police officer",
        "midwife",
    ):
        assert occupation_stereotype(none_occ) is None, none_occ
    # female list checked first
    assert occupation_stereotype("clerk supervisor") == "Feminine"


def test_create_templates():
    # gender_bias.rs:933-957
    t = create_winobias_templates()
    assert len(t) == 150  # 50 occupations × 3 arms
    pro = [x for x in t if x[8] == "ProStereotypical"]
    anti = [x for x in t if x[8] == "AntiStereotypical"]
    neu = [x for x in t if x[8] == "Neutral"]
    assert len(pro) == len(anti) == 50
    assert len(neu) == 50
    # spans point at the right substrings
    for (text, occ, pron, os_, oe, ps, pe, should, st, pg) in t:
        assert text[ps:pe].lower() == pron
        assert should is True
    # spot-check a transcribed offset pair
    nurse_pro = next(x for x in t if x[1] == "nurse" and x[8] == "ProStereotypical")
    assert nurse_pro[0] == "The nurse helped the patient. She was very caring."
    assert nurse_pro[0][4:9] == "nurse"


def test_neopronoun_templates():
    # gender_bias.rs:1002-1022
    t = create_neopronoun_templates()
    assert len(t) == 20
    pronouns = {x[2] for x in t}
    assert pronouns == {"xe", "ze", "ey", "fae"}
    assert all(x[8] == "Neutral" for x in t)


def test_comprehensive_templates():
    # gender_bias.rs:1048-1061
    assert len(create_comprehensive_bias_templates()) == 170


# --------------------------------------------------------------- spark


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _run(spark, examples, resolver):
    from anno_spark.eval.gender_bias import evaluate_gender_bias

    report, per_occ, per_pron = evaluate_gender_bias(spark, examples, resolver)
    return (
        report.collect()[0],
        {r.occupation: r for r in per_occ.collect()},
        {r.pronoun: r for r in per_pron.collect()},
    )


def test_evaluator_no_bias_simple_resolver(spark):
    """gender_bias.rs:959-987: the debiased SimpleCorefResolver's gap
    must be <0.3 — here it resolves every arm, so the gap is exactly 0."""
    report, per_occ, per_pron = _run(spark, create_winobias_templates(), "simple")
    assert report.pro_stereotype_accuracy == 1.0
    assert report.anti_stereotype_accuracy == 1.0
    assert report.neutral_accuracy == 1.0
    assert report.bias_gap < 0.3
    assert report.bias_gap == 0.0
    assert (report.num_pro, report.num_anti, report.num_neutral) == (50, 50, 50)
    # gender_bias.rs:989-1000 — per-pronoun keys
    assert set(per_pron) >= {"he", "she", "they"}
    # per-occupation count excludes neutral (the reference quirk)
    assert per_occ["nurse"]["count"] == 2


def test_neopronoun_resolution_simple_resolver(spark):
    """gender_bias.rs:1024-1046: >50% accuracy on neopronouns — the
    resolver recognizes them explicitly, so it scores 100%."""
    report, _, per_pron = _run(spark, create_neopronoun_templates(), "simple")
    assert report.overall_accuracy > 0.5
    assert report.overall_accuracy == 1.0
    assert report.neutral_accuracy == 1.0
    # empty pro/anti arms → accuracy 0.0 and gap 0.0 (reference quirk)
    assert report.pro_stereotype_accuracy == 0.0
    assert report.bias_gap == 0.0
    assert set(per_pron) == {"xe", "ze", "ey", "fae"}


def test_engine_resolver_pinned_behavior(spark):
    """The ENGINE resolver (core/coref.py, utils.rs port) links gendered
    pronouns only to name-gazetteer PER surfaces — occupations are not
    names, so pro/anti arms score 0 while neutral 'they' (type-based)
    scores 1. Bias gap 0: unbiased because it never gender-matches
    occupations at all. Neopronouns are outside the C1 lexicon → 0
    (exactly what MISGENDERED measures in real systems)."""
    report, per_occ, per_pron = _run(
        spark, create_comprehensive_bias_templates(), "engine"
    )
    assert report.pro_stereotype_accuracy == 0.0
    assert report.anti_stereotype_accuracy == 0.0
    assert report.bias_gap == 0.0
    # 50 winobias 'they' arms resolve; 20 neopronoun arms don't
    assert report.neutral_accuracy == pytest.approx(50 / 70)
    assert report.overall_accuracy == pytest.approx(50 / 170)
    assert per_pron["they"].accuracy == 1.0
    assert per_pron["xe"].accuracy == 0.0
    assert per_pron["she"].accuracy == 0.0


def test_report_differential_vs_transcription(spark):
    """Synthetic resolved outcomes → pure-python transcription of
    evaluate_resolver()'s aggregation (gender_bias.rs:276-415)."""
    from anno_spark.eval.gender_bias import (
        gender_bias_report,
        per_occupation_bias,
        per_pronoun_accuracy,
    )

    rows = [
        # text, occ, pron, os, oe, ps, pe, should, arm, gender, correct
        ("t", "Nurse", "she", 0, 1, 2, 3, True, "ProStereotypical", "Feminine", True),
        ("t", "nurse", "he", 0, 1, 2, 3, True, "AntiStereotypical", "Masculine", False),
        ("t", "nurse", "they", 0, 1, 2, 3, True, "Neutral", "Neutral", True),
        ("t", "engineer", "he", 0, 1, 2, 3, True, "ProStereotypical", "Masculine", True),
        ("t", "engineer", "she", 0, 1, 2, 3, True, "AntiStereotypical", "Feminine", True),
        ("t", "engineer", "she", 0, 1, 2, 3, True, "AntiStereotypical", "Feminine", False),
    ]
    schema = (
        "text string, occupation string, pronoun string, occupation_start int, "
        "occupation_end int, pronoun_start int, pronoun_end int, "
        "should_resolve boolean, stereotype_type string, pronoun_gender string, "
        "resolved_correctly boolean"
    )
    resolved = spark.createDataFrame(rows, schema)
    r = gender_bias_report(resolved).collect()[0]
    # pro: 2/2; anti: 1/3; neutral: 1/1; overall 4/6
    assert r.pro_stereotype_accuracy == pytest.approx(1.0)
    assert r.anti_stereotype_accuracy == pytest.approx(1 / 3)
    assert r.neutral_accuracy == pytest.approx(1.0)
    assert r.bias_gap == pytest.approx(1.0 - 1 / 3)
    assert r.overall_accuracy == pytest.approx(4 / 6)
    assert (r.num_pro, r.num_anti, r.num_neutral) == (2, 3, 1)

    occ = {x.occupation: x for x in per_occupation_bias(resolved).collect()}
    # case-insensitive occupation rollup ("Nurse" + "nurse")
    assert occ["nurse"].pro_accuracy == 1.0
    assert occ["nurse"].anti_accuracy == 0.0
    assert occ["nurse"].bias_gap == 1.0
    assert occ["nurse"]["count"] == 2  # pro+anti only, neutral excluded
    assert occ["engineer"].anti_accuracy == pytest.approx(0.5)
    assert occ["engineer"]["count"] == 3

    pron = {x.pronoun: x for x in per_pronoun_accuracy(resolved).collect()}
    assert pron["she"].accuracy == pytest.approx(2 / 3)
    assert pron["he"].accuracy == pytest.approx(0.5)
    assert pron["they"].accuracy == 1.0


def test_empty_examples_report(spark):
    from anno_spark.eval.gender_bias import gender_bias_report, resolve_examples, templates_df

    resolved = resolve_examples(templates_df(spark, []), "simple")
    r = gender_bias_report(resolved).collect()[0]
    assert r.overall_accuracy == 0.0
    assert r.pro_stereotype_accuracy == 0.0
    assert r.neutral_accuracy is None
    assert r.bias_gap == 0.0

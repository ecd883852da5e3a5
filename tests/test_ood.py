"""OOD detection (reference: anno/src/eval/ood_detection.rs).

Transcribed reference tests (ood_detection.rs:381-465), a pure-python
transcription differential over a mixed corpus, the short/empty-text
n-gram quirks, and broadcast-vs-shuffled join path equivalence.
"""

from __future__ import annotations

import pytest

from anno_spark.eval.ood import (
    OODConfig,
    fit_ood,
    ood_analyze,
    ood_rate_grade,
    ood_status,
)


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _train(spark, texts):
    return fit_ood(spark.createDataFrame([(t,) for t in texts], "text string"))


def _test_df(spark, rows):
    return spark.createDataFrame(rows, "text string, confidence double")


def _status_map(spark, train_texts, rows, config=OODConfig(), broadcast=True):
    vocab, known = _train(spark, train_texts)
    df = ood_status(_test_df(spark, rows), vocab, known, config, broadcast)
    return {r.text: r for r in df.collect()}


# ------------------------------------------------------------ transcribed


def test_basic_ood_detection(spark):
    # ood_detection.rs:384-396
    train = ["John Smith", "Jane Doe", "Google", "Microsoft"]
    s = _status_map(spark, train, [("John Smith", None), ("John Doe", None)])
    assert not s["John Smith"].is_ood
    assert s["John Doe"].vocab_coverage > 0.5


def test_unusual_characters(spark):
    # ood_detection.rs:398-412
    s = _status_map(
        spark, ["John Smith"], [("John Smith", None), ("John​Smith", None)]
    )
    assert "unusual_characters" not in s["John Smith"].flagged_by
    assert "unusual_characters" in s["John​Smith"].flagged_by


def test_vocab_coverage(spark):
    # ood_detection.rs:414-427
    s = _status_map(
        spark, ["apple", "banana", "orange"], [("apple", None), ("xyz123", None)]
    )
    assert s["apple"].vocab_coverage > 0.9
    assert s["xyz123"].vocab_coverage < 0.5


def test_analyze_dataset(spark):
    # ood_detection.rs:429-443
    vocab, known = _train(spark, ["John Smith", "Jane Doe"])
    summary, by_method = ood_analyze(
        _test_df(spark, [("John Smith", 0.9), ("Xiangjun Chen", 0.3)]), vocab, known
    )
    s = summary.collect()[0]
    assert s.total_entities == 2
    assert s.ood_count >= 1
    assert s.sample_ood_entities == ["Xiangjun Chen"]
    assert s.avg_id_confidence == pytest.approx(0.9)
    methods = {r.method: r["count"] for r in by_method.collect()}
    assert methods.get("low_confidence") == 1


def test_confidence_threshold(spark):
    # ood_detection.rs:445-459
    cfg = OODConfig(confidence_threshold=0.7)
    s = _status_map(spark, ["seed"], [("test", 0.5)], cfg)
    assert "low_confidence" in s["test"].flagged_by
    s = _status_map(spark, ["seed"], [("test", 0.9)], cfg)
    assert "low_confidence" not in s["test"].flagged_by


def test_ood_rate_grades():
    # ood_detection.rs:461-468
    assert ood_rate_grade(0.02) == "Very low OOD (well-covered domain)"
    assert ood_rate_grade(0.10) == "Low OOD (mostly covered)"
    assert ood_rate_grade(0.25) == "Moderate OOD (some gaps)"
    assert ood_rate_grade(0.40) == "High OOD (significant gaps)"
    assert ood_rate_grade(0.60) == "Very high OOD (major domain shift)"


# ------------------------------------------------------------ quirks


def test_short_and_empty_text_ngrams(spark):
    """len < n ⇒ the text itself is the single n-gram — including ''
    for empty text (ood_detection.rs:312-315)."""
    # "ab" trained: test "ab" is one 2-char "ngram", exact member → cov 1
    s = _status_map(spark, ["ab"], [("ab", None), ("", None)])
    assert s["ab"].vocab_coverage == 1.0
    assert not s["ab"].is_ood
    # empty text: single '' ngram, not in train vocab → coverage 0, OOD
    assert s[""].vocab_coverage == 0.0
    assert "low_vocab_coverage" in s[""].flagged_by
    # '' trained ⇒ empty test text is covered AND known
    s2 = _status_map(spark, [""], [("", None)])
    assert s2[""].vocab_coverage == 1.0
    assert not s2[""].is_ood


def test_unseen_requires_low_coverage(spark):
    """unknown surface with coverage ≥ 0.8 is NOT flagged unseen
    (ood_detection.rs:203-209: 'unknown but similar = OK')."""
    s = _status_map(spark, ["John Smithson"], [("John Smiths", None)])
    assert s["John Smiths"].vocab_coverage >= 0.8
    assert "unseen_entity" not in s["John Smiths"].flagged_by
    assert not s["John Smiths"].is_ood


def test_case_insensitive_known_match(spark):
    s = _status_map(spark, ["Google"], [("GOOGLE", None), ("google", None)])
    for k in ("GOOGLE", "google"):
        assert "unseen_entity" not in s[k].flagged_by
        assert s[k].vocab_coverage == 1.0


# ------------------------------------------------------- differential


def _py_ngrams(text, n=3):
    chars = list(text.lower())
    if len(chars) < n:
        return ["".join(chars)]
    return ["".join(chars[i : i + n]) for i in range(len(chars) - n + 1)]


def _py_check(text, conf, train_ngrams, known, cfg=OODConfig()):
    """check_ood transcription (ood_detection.rs:191-228)."""
    grams = _py_ngrams(text, cfg.ngram_size)
    cov = (
        sum(1 for g in grams if g in train_ngrams) / len(grams) if grams else 1.0
    )
    flags = []
    if cov < cfg.vocab_coverage_threshold:
        flags.append("low_vocab_coverage")
    if text.lower() not in known and cov < 0.8:
        flags.append("unseen_entity")
    if conf is not None and conf < cfg.confidence_threshold:
        flags.append("low_confidence")
    if any("​" <= c <= "‏" or c in "﻿⁠" for c in text):
        flags.append("unusual_characters")
    return cov, flags


def test_differential_vs_transcription(spark):
    train = [
        "John Smith", "Jane Doe", "Google", "Microsoft", "Berlin",
        "Acme Corp", "New York", "café",
    ]
    tests = [
        ("John Smith", 0.9), ("Johnny Smithers", 0.85), ("Xqz Vwk", 0.2),
        ("google", None), ("BERLIN", 0.4), ("新華社", 0.95),
        ("Jo​hn", 0.99), ("ab", None), ("", 0.3), ("Acme Corporation", None),
    ]
    train_ngrams = {g for t in train for g in _py_ngrams(t)}
    known = {t.lower() for t in train}

    for broadcast in (True, False):
        s = _status_map(spark, train, tests, broadcast=broadcast)
        for text, conf in tests:
            cov, flags = _py_check(text, conf, train_ngrams, known)
            assert s[text].vocab_coverage == pytest.approx(cov), (text, broadcast)
            assert list(s[text].flagged_by) == flags, (text, broadcast)
            assert s[text].is_ood == bool(flags), (text, broadcast)

    # summary differential
    vocab, known_df = _train(spark, train)
    summary, by_method = ood_analyze(_test_df(spark, tests), vocab, known_df)
    row = summary.collect()[0]
    checks = [
        (t, c, _py_check(t, c, train_ngrams, known)) for t, c in tests
    ]
    ood = [(t, c) for t, c, (cov, fl) in checks if fl]
    idd = [(t, c) for t, c, (cov, fl) in checks if not fl]
    assert row.total_entities == len(tests)
    assert row.ood_count == len(ood)
    assert row.ood_rate == pytest.approx(len(ood) / len(tests))
    ood_confs = [c for _, c in ood if c is not None]
    id_confs = [c for _, c in idd if c is not None]
    assert row.avg_ood_confidence == pytest.approx(
        sum(ood_confs) / len(ood_confs) if ood_confs else 0.0
    )
    assert row.avg_id_confidence == pytest.approx(
        sum(id_confs) / len(id_confs) if id_confs else 0.0
    )
    test_ngrams = {g for t, _ in tests for g in _py_ngrams(t)}
    unseen = {g for g in test_ngrams if g not in train_ngrams}
    assert row.train_vocab_size == len(train_ngrams)
    assert row.test_vocab_size == len(test_ngrams)
    assert row.unseen_ngrams == len(unseen)
    assert row.coverage_ratio == pytest.approx(1 - len(unseen) / len(test_ngrams))
    assert row.sample_ood_entities == sorted({t for t, _ in ood})[:10]
    want_methods = {}
    for _, _, (_, fl) in checks:
        for m in fl:
            want_methods[m] = want_methods.get(m, 0) + 1
    assert {r.method: r["count"] for r in by_method.collect()} == want_methods


def test_duplicate_surfaces_count_per_row(spark):
    """analyze counts rows, not distinct surfaces (the status is
    computed once per surface and re-attached)."""
    vocab, known = _train(spark, ["John Smith"])
    rows = [("Zq", 0.1)] * 5 + [("John Smith", 0.9)]
    summary, by_method = ood_analyze(_test_df(spark, rows), vocab, known)
    s = summary.collect()[0]
    assert s.total_entities == 6
    assert s.ood_count == 5
    assert s.sample_ood_entities == ["Zq"]
    m = {r.method: r["count"] for r in by_method.collect()}
    assert m["low_confidence"] == 5

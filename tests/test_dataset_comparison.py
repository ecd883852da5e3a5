"""Dataset comparison (reference: anno/src/eval/dataset_comparison.rs).

Layers: the seven transcribed (non-feature-gated) reference tests
(dataset_comparison.rs:637-763); quirk pins (upper median, population
std, token-count floor, negative-score difficulty bucketing, Rust
Vec-debug recommendation rendering); a pure-python transcription of
compute_stats/JS as a differential oracle over seeded random corpora.
"""

from __future__ import annotations

import math
import random

import pytest

from anno_spark.eval.dataset_comparison import (
    DifficultyEstimate,
    compare_datasets,
    comparison_recommendations,
    dataset_stats,
    estimate_difficulty,
    js_divergence,
    type_distribution,
)

EX_SCHEMA = "example_id long, text string"
EN_SCHEMA = "example_id long, text string, entity_type string"


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _mk(spark, examples):
    """examples: list of (text, [(etext, etype), ...])."""
    ex_rows = [(i, t) for i, (t, _) in enumerate(examples)]
    en_rows = [
        (i, et, ty) for i, (_, ents) in enumerate(examples) for et, ty in ents
    ]
    return (
        spark.createDataFrame(ex_rows, EX_SCHEMA)
        if ex_rows
        else spark.createDataFrame([], EX_SCHEMA),
        spark.createDataFrame(en_rows, EN_SCHEMA)
        if en_rows
        else spark.createDataFrame([], EN_SCHEMA),
    )


def _dist(spark, mapping):
    rows = [(t, p, 1) for t, p in mapping.items()]
    return spark.createDataFrame(
        rows, "entity_type string, proportion double, n long"
    )


# ------------------------------------------------------------ transcribed


def test_compute_stats_empty(spark):
    ex, en = _mk(spark, [])
    s = dataset_stats(ex, en).collect()[0]
    assert s.num_examples == 0
    assert s.num_entities == 0
    assert s.entity_diversity == 1.0


def test_compute_stats_basic(spark):
    # dataset_comparison.rs:674-693
    ex, en = _mk(spark, [
        ("John works at Google.", [("John", "PER"), ("Google", "ORG")]),
        ("Paris is in France.", [("Paris", "LOC"), ("France", "LOC")]),
    ])
    s = dataset_stats(ex, en).collect()[0]
    assert s.num_examples == 2
    assert s.num_entities == 4
    assert s.avg_entities_per_example == 2.0
    types = {r.entity_type for r in type_distribution(en).collect()}
    assert types == {"PER", "ORG", "LOC"}


def test_compare_identical_datasets(spark):
    # dataset_comparison.rs:695-708
    ex, en = _mk(spark, [
        ("John works at Google.", [("John", "PER"), ("Google", "ORG")]),
    ])
    c = compare_datasets(ex, en, ex, en)
    assert c.type_divergence < 0.01
    assert abs(c.vocab_overlap - 1.0) < 0.01
    assert abs(c.entity_text_overlap - 1.0) < 0.01


def test_compare_different_datasets(spark):
    # dataset_comparison.rs:710-721
    ex_a, en_a = _mk(spark, [("John works at Google.", [("John", "PER")])])
    ex_b, en_b = _mk(spark, [("Paris is beautiful.", [("Paris", "LOC")])])
    c = compare_datasets(ex_a, en_a, ex_b, en_b)
    assert c.type_divergence > 0.5
    assert c.vocab_overlap < 0.5
    assert abs(c.entity_text_overlap) < 0.01
    assert c.types_only_in_a == ["PER"]
    assert c.types_only_in_b == ["LOC"]


def test_jensen_shannon_identical(spark):
    # dataset_comparison.rs:723-731
    p = _dist(spark, {"A": 0.5, "B": 0.5})
    assert js_divergence(p, p) < 0.01


def test_jensen_shannon_disjoint(spark):
    # dataset_comparison.rs:733-743
    p = _dist(spark, {"A": 1.0})
    q = _dist(spark, {"B": 1.0})
    assert js_divergence(p, q) > 0.9


def test_difficulty_estimation(spark):
    # dataset_comparison.rs:745-768
    ex_e, en_e = _mk(spark, [
        ("John works here.", [("John", "PER")]),
        ("John went home.", [("John", "PER")]),
    ])
    ex_h, en_h = _mk(spark, [(
        "International Business Machines Corporation announced.",
        [("International Business Machines Corporation", "ORG")],
    )])
    easy = estimate_difficulty(dataset_stats(ex_e, en_e).collect()[0])
    hard = estimate_difficulty(dataset_stats(ex_h, en_h).collect()[0])
    assert hard.score >= easy.score


# ------------------------------------------------------------ quirks


def test_upper_median_and_population_std(spark):
    # lengths [1, 1, 2, 5]: sorted[4/2] = sorted[2] = 2 (upper median);
    # population std divides by n (dataset_comparison.rs:156-185)
    ex, en = _mk(spark, [(
        "irrelevant text",
        [("a", "T"), ("b", "T"), ("two tokens", "T"),
         ("five token entity right here", "T")],
    )])
    s = dataset_stats(ex, en).collect()[0]
    lengths = [1, 1, 2, 5]
    mean = sum(lengths) / 4
    var = sum((l - mean) ** 2 for l in lengths) / 4
    assert s.len_median == 2.0
    assert s.len_mean == pytest.approx(mean)
    assert s.len_std == pytest.approx(math.sqrt(var))
    assert s.len_min == 1 and s.len_max == 5


def test_token_count_floors_at_one(spark):
    # entity text "" counts as 1 token (dataset_comparison.rs:144-145)
    ex, en = _mk(spark, [("x", [("", "T")])])
    s = dataset_stats(ex, en).collect()[0]
    assert s.len_min == 1 and s.len_mean == 1.0


def test_entity_diversity_repetition(spark):
    # 3 entities, 2 unique (case-insensitive) -> 2/3
    ex, en = _mk(spark, [
        ("a", [("John", "PER"), ("JOHN", "PER"), ("Mary", "PER")]),
    ])
    s = dataset_stats(ex, en).collect()[0]
    assert s.unique_entity_texts == 2
    assert s.entity_diversity == pytest.approx(2 / 3)


def test_difficulty_negative_score_clamps_reported_only():
    # low diversity subtracts: raw score -0.1 buckets Easy, reported 0.0
    class S:
        n_types = 1
        len_mean = 1.0
        len_std = 0.0
        entity_diversity = 0.1
        avg_entities_per_example = 2.0

    d = estimate_difficulty(S())
    assert d.difficulty == "Easy"
    assert d.score == 0.0
    assert "Low entity diversity (model can memorize)" in d.factors


def test_recommendations_rust_debug_format():
    recs = comparison_recommendations(0.6, 0.1, 0.0, ["PER"], ["LOC", "ORG"])
    assert (
        'Types in source only: ["PER"] - target may not need these' in recs
    )
    assert (
        'Types in target only: ["LOC", "ORG"] - source cannot help with'
        " these" in recs
    )
    assert recs[0] == (
        "High type distribution divergence - consider domain adaptation"
    )
    # compatible datasets -> the single fallback line
    assert comparison_recommendations(0.0, 1.0, 1.0, [], []) == [
        "Datasets appear compatible for transfer learning"
    ]


# ------------------------------------------------------------ differential


def _ref_stats(examples):
    """compute_stats transcription (dataset_comparison.rs:104-197).
    examples: [(text, [(etext, etype), ...])]."""
    if not examples:
        return None
    type_counts: dict[str, int] = {}
    vocab, etexts, lengths = set(), set(), []
    total = 0
    for text, ents in examples:
        for tok in text.split():
            vocab.add(tok.lower())
        for et, ty in ents:
            total += 1
            type_counts[ty] = type_counts.get(ty, 0) + 1
            etexts.add(et.lower())
            lengths.append(max(len(et.split()), 1))
    out = dict(
        num_examples=len(examples), num_entities=total,
        n_types=len(type_counts),
        avg=total / len(examples), vocab=len(vocab),
        uniq=len(etexts), div=len(etexts) / max(total, 1),
        dist={t: c / max(total, 1) for t, c in type_counts.items()},
    )
    if lengths:
        srt = sorted(lengths)
        mean = sum(lengths) / len(lengths)
        var = sum((l - mean) ** 2 for l in lengths) / len(lengths)
        out.update(mean=mean, median=float(srt[len(srt) // 2]),
                   std=math.sqrt(var), lo=srt[0], hi=srt[-1])
    else:
        out.update(mean=0.0, median=0.0, std=0.0, lo=0, hi=0)
    return out


def _ref_js(p, q):
    keys = set(p) | set(q)
    if not keys:
        return 0.0
    kl = 0.0
    for k in keys:
        pv, qv = p.get(k, 0.0), q.get(k, 0.0)
        m = (pv + qv) / 2.0
        if pv > 0.0:
            kl += pv * math.log(pv / m)
        if qv > 0.0:
            kl += qv * math.log(qv / m)
    return (kl / 2.0) / math.log(2.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_differential_random_corpora(spark, seed):
    rng = random.Random(seed)
    words = ["alpha", "beta", "Gamma", "delta", "EPSILON", "zeta"]
    types = ["PER", "ORG", "LOC", "DATE"]

    def corpus(n):
        out = []
        for _ in range(n):
            text = " ".join(rng.choice(words) for _ in range(rng.randint(3, 9)))
            ents = [
                (" ".join(rng.choice(words) for _ in range(rng.randint(1, 4))),
                 rng.choice(types))
                for _ in range(rng.randint(0, 3))
            ]
            out.append((text, ents))
        return out

    ca, cb = corpus(12), corpus(9)
    exp_a, exp_b = _ref_stats(ca), _ref_stats(cb)

    ex_a, en_a = _mk(spark, ca)
    ex_b, en_b = _mk(spark, cb)
    c = compare_datasets(ex_a, en_a, ex_b, en_b)

    for got, exp in ((c.stats_a, exp_a), (c.stats_b, exp_b)):
        assert got.num_examples == exp["num_examples"]
        assert got.num_entities == exp["num_entities"]
        assert got.n_types == exp["n_types"]
        assert got.vocab_size == exp["vocab"]
        assert got.unique_entity_texts == exp["uniq"]
        assert got.entity_diversity == pytest.approx(exp["div"])
        assert got.len_mean == pytest.approx(exp["mean"])
        assert got.len_median == exp["median"]
        assert got.len_std == pytest.approx(exp["std"])
        assert (got.len_min, got.len_max) == (exp["lo"], exp["hi"])

    assert c.type_divergence == pytest.approx(
        _ref_js(exp_a["dist"], exp_b["dist"]), rel=1e-9
    )

    va = {w.lower() for t, _ in ca for w in t.split()}
    vb = {w.lower() for t, _ in cb for w in t.split()}
    assert c.vocab_overlap == pytest.approx(
        len(va & vb) / len(va | vb) if va | vb else 1.0
    )
    ea = {e.lower() for _, ents in ca for e, _ in ents}
    eb = {e.lower() for _, ents in cb for e, _ in ents}
    assert c.entity_text_overlap == pytest.approx(
        len(ea & eb) / len(ea | eb) if ea | eb else 1.0
    )
    exp_gap = (
        0.4 * c.type_divergence
        + 0.3 * (1 - c.vocab_overlap)
        + 0.3 * (1 - c.entity_text_overlap)
    )
    assert c.estimated_domain_gap == pytest.approx(exp_gap)
    assert c.recommendations

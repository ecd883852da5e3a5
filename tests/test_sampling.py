"""Evaluation sampling strategies (reference: anno/src/eval/sampling.rs).

Layers: the four transcribed reference tests (sampling.rs:241-313);
stratification-proportion checks the reference only documents; quirk
pins (identity short-circuit, EMPTY grouping, ceil-overshoot trim,
order preservation, determinism across invocations).
"""

from __future__ import annotations

import pytest

from anno_spark.eval.sampling import (
    multi_seed_eval,
    stratified_sample,
    stratified_sample_ner,
)

CASE_SCHEMA = "case_id long, text string"
GOLD_SCHEMA = "case_id long, entity_idx int, entity_type string, original_label string"


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _cases(spark, n, fmt="Text {}"):
    return spark.createDataFrame(
        [(i, fmt.format(i)) for i in range(n)], CASE_SCHEMA
    )


# ------------------------------------------------------------ transcribed


def test_stratified_sample_smaller(spark):
    # sampling.rs:269-274 — target > len returns everything
    cases = _cases(spark, 3)
    assert stratified_sample(cases, 10, 42).count() == 3


def test_stratified_sample_deterministic(spark):
    # sampling.rs:276-283
    cases = _cases(spark, 5)
    s1 = [r.case_id for r in stratified_sample(cases, 2, 42).collect()]
    s2 = [r.case_id for r in stratified_sample(cases, 2, 42).collect()]
    assert len(s1) == 2
    assert s1 == s2


def test_stratified_sample_different_seeds(spark):
    # sampling.rs:285-303
    cases = _cases(spark, 100)
    t1 = [r.text for r in stratified_sample(cases, 10, 42).collect()]
    t2 = [r.text for r in stratified_sample(cases, 10, 123).collect()]
    assert t1 != t2


def test_multi_seed_eval():
    # sampling.rs:305-313
    mean, std, lo, hi = multi_seed_eval(
        lambda seed: 0.8 + (seed % 10) / 100.0, [1, 2, 3, 4, 5]
    )
    assert 0.8 < mean < 0.9
    assert std >= 0.0
    assert lo <= mean <= hi


def test_multi_seed_eval_empty_and_single():
    assert multi_seed_eval(lambda s: 1.0, []) == (0.0, 0.0, 0.0, 0.0)
    mean, std, lo, hi = multi_seed_eval(lambda s: 0.5, [7])
    assert (mean, std, lo, hi) == (0.5, 0.0, 0.5, 0.5)


# ------------------------------------------------------------ behavior


def test_sample_preserves_original_order(spark):
    # sampling.rs:88-89 — selected ids come back ascending
    cases = _cases(spark, 50)
    out = [r.case_id for r in stratified_sample(cases, 10, 7).collect()]
    assert out == sorted(out)
    assert len(out) == 10
    assert len(set(out)) == 10


def _typed_corpus(spark, n=100):
    """60% PER / 30% ORG / 10% LOC dominant types."""
    cases = _cases(spark, n)
    gold_rows = []
    for i in range(n):
        t = "PER" if i % 10 < 6 else ("ORG" if i % 10 < 9 else "LOC")
        gold_rows.append((i, 0, t, t.lower()))
        gold_rows.append((i, 1, "MISC", "misc"))  # non-first entity ignored
    gold = spark.createDataFrame(gold_rows, GOLD_SCHEMA)
    return cases, gold


def test_ner_sample_maintains_proportions(spark):
    # the module-doc motivation (sampling.rs:14-23): 60/30/10 in, the
    # ceil allocations 6/3/1 out
    cases, gold = _typed_corpus(spark)
    out = stratified_sample_ner(cases, gold, 10, 42)
    picked = [r.case_id for r in out.collect()]
    assert len(picked) == 10
    types = ["PER" if i % 10 < 6 else ("ORG" if i % 10 < 9 else "LOC") for i in picked]
    from collections import Counter

    c = Counter(types)
    # ceil allocation guarantees every type is represented and the trim
    # can only remove overshoot
    assert c["LOC"] >= 1
    assert c["ORG"] >= 2
    assert c["PER"] >= 5
    assert picked == sorted(picked)


def test_ner_sample_empty_type_group(spark):
    # entity-less cases group under "EMPTY" (sampling.rs:139-145)
    cases = _cases(spark, 20)
    gold = spark.createDataFrame(
        [(i, 0, "PER", "per") for i in range(10)], GOLD_SCHEMA
    )  # cases 10..19 have no gold
    out = stratified_sample_ner(cases, gold, 10, 1)
    picked = [r.case_id for r in out.collect()]
    assert len(picked) == 10
    # both the PER group and the EMPTY group get their ceil(0.5*10)=5
    assert sum(1 for i in picked if i < 10) == 5
    assert sum(1 for i in picked if i >= 10) == 5


def test_ner_sample_identity_when_small(spark):
    cases, gold = _typed_corpus(spark, 8)
    assert stratified_sample_ner(cases, gold, 10, 42).count() == 8


def test_ner_sample_deterministic(spark):
    cases, gold = _typed_corpus(spark)
    a = [r.case_id for r in stratified_sample_ner(cases, gold, 15, 9).collect()]
    b = [r.case_id for r in stratified_sample_ner(cases, gold, 15, 9).collect()]
    assert a == b
    assert len(a) == 15


def test_ner_sample_with_type_mapper(spark):
    # mapper normalizes original_label before grouping (sampling.rs:134-141)
    from anno_spark.operators.schema_map import TypeMapper

    cases = _cases(spark, 20)
    gold = spark.createDataFrame(
        [(i, 0, "RAW", "actor" if i < 10 else "song") for i in range(20)],
        GOLD_SCHEMA,
    )
    mapper = TypeMapper.mit_movie()  # actor -> PER-family, song -> WORK-family
    out = stratified_sample_ner(cases, gold, 10, 3, mapper=mapper)
    picked = [r.case_id for r in out.collect()]
    assert len(picked) == 10
    # two equal groups -> 5 from each half
    assert sum(1 for i in picked if i < 10) == 5
    assert sum(1 for i in picked if i >= 10) == 5

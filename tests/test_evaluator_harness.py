"""Standard evaluator + eval harness: metric math, aggregation
statistics, goals, and the one-pass distributed breakdown property.

Reference: anno/src/eval/evaluator.rs (metric semantics, std/CI
formulas) and anno/src/eval/harness.rs (config presets, registry,
breakdown behavior).
"""

from __future__ import annotations

import math

import pytest

from anno_spark.eval import evaluator as EV
from anno_spark.eval import harness as H


# ---------------------------------------------------------------------------
# evaluator


def test_perfect_case():
    cm = EV.evaluate_test_case([(0, 4, "PER")], [(0, 4, "PER")])
    assert (cm.precision, cm.recall, cm.f1) == (1.0, 1.0, 1.0)
    assert cm.per_type["PER"].correct == 1


def test_duplicate_prediction_cannot_inflate_precision():
    # greedy gold-claiming (evaluator.rs:362-380)
    cm = EV.evaluate_test_case([(0, 4, "PER"), (0, 4, "PER")],
                               [(0, 4, "PER")])
    assert cm.correct == 1
    assert cm.found == 2
    assert cm.precision == pytest.approx(0.5)
    assert cm.recall == pytest.approx(1.0)


def test_type_mismatch_not_correct():
    cm = EV.evaluate_test_case([(0, 4, "ORG")], [(0, 4, "PER")])
    assert cm.correct == 0
    assert cm.per_type["PER"].expected == 1
    assert cm.per_type["ORG"].found == 1


def test_empty_prediction_zero_precision():
    cm = EV.evaluate_test_case([], [(0, 4, "PER")])
    assert (cm.precision, cm.recall, cm.f1) == (0.0, 0.0, 0.0)


def test_aggregate_micro_vs_macro():
    # case 1: 1/1 perfect; case 2: 1 correct of 100 expected/found —
    # macro inflates, micro does not (evaluator.rs doc rationale)
    c1 = EV.evaluate_test_case([(0, 1, "PER")], [(0, 1, "PER")])
    pred2 = [(i * 10, i * 10 + 1, "PER") for i in range(100)]
    gold2 = [(0, 1, "PER")] + [(i * 1000 + 5, i * 1000 + 6, "LOC")
                               for i in range(99)]
    c2 = EV.evaluate_test_case(pred2, gold2)
    agg = EV.aggregate([c1, c2])
    assert agg.total_found == 101
    assert agg.total_expected == 101
    assert agg.total_correct == 2
    assert agg.precision == pytest.approx(2 / 101)
    assert agg.macro_precision == pytest.approx((1.0 + 0.01) / 2)
    assert agg.macro_precision > agg.precision


def test_std_dev_and_ci():
    # n-1 estimator; 0.0 / None below two samples (evaluator.rs:706-745)
    assert EV.std_dev([0.5], 0.5) == 0.0
    assert EV.ci_95([0.5], 0.5, 0.0) is None
    vals = [0.4, 0.6]
    sd = EV.std_dev(vals, 0.5)
    assert sd == pytest.approx(math.sqrt(((0.1) ** 2 + (0.1) ** 2) / 1))
    lo, hi = EV.ci_95(vals, 0.5, sd)
    margin = 1.96 * sd / math.sqrt(2)
    assert lo == pytest.approx(max(0.5 - margin, 0.0))
    assert hi == pytest.approx(min(0.5 + margin, 1.0))


def test_ci_clamped_to_unit_interval():
    vals = [0.0, 1.0]
    sd = EV.std_dev(vals, 0.5)
    lo, hi = EV.ci_95(vals, 0.5, sd)
    assert 0.0 <= lo <= hi <= 1.0


def test_aggregate_empty_raises():
    with pytest.raises(ValueError):
        EV.aggregate([])


def test_check_goals():
    c = EV.evaluate_test_case([(0, 4, "PER"), (10, 14, "ORG")],
                              [(0, 4, "PER")])
    agg = EV.aggregate([c])
    goals = EV.MetricGoals(min_precision=0.9, min_recall=0.9,
                           per_type_goals={
                               "PER": EV.MetricGoals(min_f1=0.99),
                               "MISSING": EV.MetricGoals(min_f1=0.99),
                           })
    failures = EV.check_goals(agg, goals)
    names = [f[0] for f in failures]
    assert "precision" in names          # 0.5 < 0.9
    assert "recall" not in names         # 1.0 >= 0.9
    assert "PER.f1" not in names         # per-type PER is perfect
    assert "MISSING.f1" not in names     # absent types skipped


# ---------------------------------------------------------------------------
# harness config presets (harness.rs:98-165)


def test_config_presets():
    q = H.EvalConfig.quick()
    assert q.max_examples_per_dataset == 100
    assert not q.breakdown_by_difficulty
    f = H.EvalConfig.full()
    assert f.max_examples_per_dataset == 0
    assert f.normalize_types


def test_ci_aware_env_contract(monkeypatch):
    monkeypatch.delenv("CI", raising=False)
    monkeypatch.delenv("GITHUB_ACTIONS", raising=False)
    monkeypatch.delenv("ANNO_MAX_EXAMPLES", raising=False)
    assert H.EvalConfig.ci_aware().max_examples_per_dataset == 0
    monkeypatch.setenv("CI", "1")
    cfg = H.EvalConfig.ci_aware()
    assert cfg.max_examples_per_dataset == 50
    assert not cfg.breakdown_by_difficulty
    monkeypatch.setenv("ANNO_MAX_EXAMPLES", "20")
    assert H.EvalConfig.ci_aware().max_examples_per_dataset == 20


def test_registry_defaults():
    r = H.BackendRegistry()
    r.register_defaults()
    assert len(r) == 3
    names = [n for (n, _, _) in r]
    assert names == ["regex", "heuristic", "stacked"]


def test_empty_registry_raises(spark):
    with pytest.raises(ValueError):
        H.EvalHarness().run_synthetic(spark)


# ---------------------------------------------------------------------------
# distributed run


@pytest.fixture(scope="module")
def harness_results(spark):
    h = H.EvalHarness(H.EvalConfig())
    h.register_defaults()
    return h.run_synthetic(spark)


def test_run_synthetic_shape(harness_results):
    res = harness_results
    assert len(res.backends) == 3
    for (name, _desc, drs) in res.backends:
        assert len(drs) == 1
        r = drs[0]
        # 170 examples minus the corpus's intentional empty-text
        # adversarial case, which the harness filters exactly like the
        # reference (!ex.text.is_empty(), harness.rs:601)
        assert r.num_examples == 169
        assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.f1 <= 1.0
    assert res.dataset_stats["total_examples"] == 170


def test_breakdowns_partition_the_corpus(harness_results):
    # one-pass regrouping property: per-difficulty example counts sum to
    # the full corpus, and summed per-difficulty counters equal overall
    res = harness_results
    for (name, _desc, drs) in res.backends:
        overall = drs[0]
        subs = [r for rs in res.by_difficulty.values()
                for r in rs if r.backend_name == name]
        assert sum(r.num_examples for r in subs) == overall.num_examples
        assert sum(r.found for r in subs) == overall.found
        assert sum(r.expected for r in subs) == overall.expected
    assert set(res.by_difficulty) == {"Easy", "Medium", "Hard",
                                      "Adversarial"}


def test_stacked_not_worse_than_parts(harness_results):
    # the stacked merge should dominate-or-match its weakest layer on F1
    by_name = {name: drs[0] for (name, _d, drs) in harness_results.backends}
    assert by_name["stacked"].f1 >= min(by_name["regex"].f1,
                                        by_name["heuristic"].f1)


def test_report_renders(harness_results):
    text = H.report(harness_results)
    assert "stacked" in text
    assert "by difficulty" in text


def test_run_cases_external(spark):
    h = H.EvalHarness(H.EvalConfig.quick())
    h.registry.register("stacked", "s",
                        __import__("anno_spark.core.stacked",
                                   fromlist=["x"]).extract_entities)
    cases = [("Barack Obama visited Paris.",
              [("Barack Obama", "PER", 0), ("Paris", "LOC", 21)])]
    res = h.run_cases(spark, "tiny", cases)
    r = res.backends[0][2][0]
    assert r.dataset_name == "tiny"
    assert r.num_examples == 1
    assert r.num_gold_entities == 2

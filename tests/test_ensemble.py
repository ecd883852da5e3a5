"""Ensemble disagreement metrics (reference: anno/src/eval/ensemble.rs).

Layers: the six transcribed reference tests (ensemble.rs:461-590); a
pure-python transcription of analyze_single/analyze_batch/kappa as a
differential oracle over seeded random multi-model predictions; quirk
pins (first-occurrence duplicates, lowercased agreement identity vs
raw-pair pairwise Jaccard, implicit-None roster votes, majority-only
types scoring 0 agreement).
"""

from __future__ import annotations

import random

import pytest

from anno_spark.eval.ensemble import (
    agreement_by_type,
    agreement_grade,
    ensemble_report,
    entity_agreement,
    fleiss_kappa,
    kappa_interpretation,
    pairwise_agreement,
    predictions_df,
    single_example_analysis,
)


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _preds(spark, rows):
    return predictions_df(spark, rows)


def _flat(example_models):
    """{example: {model: [(text, type), ...]}} -> prediction rows."""
    return [
        (ex, m, i, t, ty)
        for ex, models in example_models.items()
        for m, ents in models.items()
        for i, (t, ty) in enumerate(ents)
    ]


# ------------------------------------------------------------ transcribed


def test_perfect_agreement(spark):
    # ensemble.rs:464-487
    rows = _flat({"e0": {
        "model_a": [("John", "PER"), ("Google", "ORG")],
        "model_b": [("John", "PER"), ("Google", "ORG")],
    }})
    r = single_example_analysis(_preds(spark, rows)).collect()[0]
    assert abs(r.agreement_rate - 1.0) < 0.01
    assert r.n_agreed == 2
    assert r.n_disagreed == 0


def test_partial_disagreement(spark):
    # ensemble.rs:489-512
    rows = _flat({"e0": {
        "model_a": [("John", "PER"), ("Google", "ORG")],
        "model_b": [("John", "PER"), ("Google", "LOC")],
    }})
    r = single_example_analysis(_preds(spark, rows)).collect()[0]
    assert abs(r.agreement_rate - 0.5) < 0.01
    assert r.n_agreed == 1
    assert r.n_disagreed == 1


def test_missing_entity(spark):
    # ensemble.rs:514-533 — model_b didn't predict Google: disagreement
    rows = _flat({"e0": {
        "model_a": [("John", "PER"), ("Google", "ORG")],
        "model_b": [("John", "PER")],
    }})
    r = single_example_analysis(_preds(spark, rows)).collect()[0]
    assert r.n_disagreed == 1


def test_batch_analysis(spark):
    # ensemble.rs:535-565
    rows = _flat({
        "e0": {"a": [("x", "T1")], "b": [("x", "T1")]},
        "e1": {"a": [("y", "T2")], "b": [("y", "T3")]},
    })
    r = ensemble_report(_preds(spark, rows)).collect()[0]
    assert r.total_examples == 2
    assert 0.0 < r.overall_agreement_rate < 1.0


def test_agreement_grades():
    # ensemble.rs:567-574
    assert agreement_grade(0.98) == "Excellent agreement"
    assert agreement_grade(0.90) == "Good agreement"
    assert agreement_grade(0.75) == "Moderate agreement"
    assert agreement_grade(0.55) == "Fair agreement"
    assert agreement_grade(0.30) == "Poor agreement"


def test_kappa_interpretation():
    # ensemble.rs:576-584
    assert kappa_interpretation(-0.1) == "Less than chance agreement"
    assert kappa_interpretation(0.10) == "Slight agreement"
    assert kappa_interpretation(0.35) == "Fair agreement"
    assert kappa_interpretation(0.55) == "Moderate agreement"
    assert kappa_interpretation(0.75) == "Substantial agreement"
    assert kappa_interpretation(0.90) == "Almost perfect agreement"


# ------------------------------------------------------------ quirks


def test_first_occurrence_resolves_duplicates(spark):
    # find() takes the model's FIRST (text, type) for a surface
    # (ensemble.rs:141-146): model_a's late "john"->ORG is invisible.
    rows = _flat({"e0": {
        "a": [("John", "PER"), ("john", "ORG")],
        "b": [("John", "PER")],
    }})
    ent = entity_agreement(_preds(spark, rows)).collect()
    assert len(ent) == 1
    assert ent[0].agreed
    assert ent[0].agreed_type == "PER"


def test_lowercase_identity_for_agreement(spark):
    # "Google" and "google" are ONE entity for agreement
    # (ensemble.rs:131-135)…
    rows = _flat({"e0": {
        "a": [("Google", "ORG")],
        "b": [("google", "ORG")],
    }})
    ent = entity_agreement(_preds(spark, rows)).collect()
    assert len(ent) == 1 and ent[0].agreed
    # …but the pairwise matrix compares RAW (text, type) pairs
    # (ensemble.rs:267-276): zero intersection, union 2 -> 0.0
    pw = pairwise_agreement(_preds(spark, rows)).collect()
    assert len(pw) == 1
    assert pw[0].agreement == 0.0


def test_majority_vote_and_confidence(spark):
    rows = _flat({"e0": {
        "a": [("Paris", "LOC")],
        "b": [("Paris", "LOC")],
        "c": [("Paris", "PER")],
    }})
    ent = entity_agreement(_preds(spark, rows)).collect()[0]
    assert not ent.agreed
    assert ent.majority_type == "LOC"
    assert ent.majority_confidence == pytest.approx(2 / 3)


def test_majority_only_type_scores_zero_agreement(spark):
    # the disagreement's majority type joins type_total with no agreed
    # credit (ensemble.rs:247-252)
    rows = _flat({"e0": {
        "a": [("x", "MISC"), ("y", "PER")],
        "b": [("x", "MISC"), ("y", "ORG")],
        "c": [("x", "MISC"), ("y", "PER")],
    }})
    by_type = {
        r.entity_type: r for r in agreement_by_type(_preds(spark, rows)).collect()
    }
    assert by_type["MISC"].rate == 1.0
    assert by_type["PER"].rate == 0.0  # only present via the majority vote
    assert "ORG" not in by_type
    # most-disagreed ordering: PER (1.0) before MISC (0.0)
    ordered = agreement_by_type(_preds(spark, rows)).collect()
    assert ordered[0].entity_type == "PER"


def test_roster_none_vote_forces_disagreement(spark):
    # an explicitly rostered model with no predictions is an implicit
    # None vote (ensemble.rs:160-163)
    roster_rows = [("e0", "a"), ("e0", "b"), ("e0", "c")]
    rows = _flat({"e0": {"a": [("x", "T")], "b": [("x", "T")]}})
    preds = _preds(spark, rows)
    roster = spark.createDataFrame(roster_rows, "example_id string, model_name string")
    ent = entity_agreement(preds, roster).collect()[0]
    assert not ent.agreed
    assert ent.n_models == 3 and ent.n_pred == 2
    # without the roster, only the 2 predicting models exist: agreement
    assert entity_agreement(preds).collect()[0].agreed


def test_empty_batch_defaults(spark):
    empty = _preds(spark, [])
    r = ensemble_report(empty).collect()[0]
    assert r.overall_agreement_rate == 1.0
    assert r.fleiss_kappa == 1.0
    assert r.total_examples == 0
    assert r.total_entities == 0


# ------------------------------------------------------------ differential


def _ref_single(models: dict[str, list[tuple]]):
    """analyze_single (ensemble.rs:117-202) with the port's
    deterministic majority tie-break (count desc, type asc)."""
    all_texts = {t.lower() for ents in models.values() for t, _ in ents}
    agreed, disagreed = [], []
    for text in sorted(all_texts):
        votes = {}
        for m, ents in models.items():
            typ = next((ty for t, ty in ents if t.lower() == text), None)
            votes[m] = typ
        non_none = [v for v in votes.values() if v is not None]
        if not non_none:
            continue
        if len(set(non_none)) == 1 and len(non_none) == len(votes):
            agreed.append((text, non_none[0]))
        else:
            counts = {}
            for t in non_none:
                counts[t] = counts.get(t, 0) + 1
            maj = min(counts, key=lambda t: (-counts[t], t))
            disagreed.append((text, maj, counts[maj] / len(models)))
    return agreed, disagreed


def _ref_kappa(batch):
    n_subjects, p_sum, total_ratings = 0, 0.0, 0
    cat_props: dict[str, float] = {}
    for models in batch.values():
        if not models:
            continue
        n = len(models)
        all_texts = {t.lower() for ents in models.values() for t, _ in ents}
        for text in all_texts:
            n_subjects += 1
            counts: dict[str, int] = {}
            for ents in models.values():
                typ = next((ty for t, ty in ents if t.lower() == text), None)
                if typ is not None:
                    counts[typ] = counts.get(typ, 0) + 1
                    total_ratings += 1
                    cat_props[typ] = cat_props.get(typ, 0.0) + 1.0
            sum_sq = sum(c * c for c in counts.values())
            p_sum += (sum_sq - n) / (n * (n - 1.0))
    if n_subjects == 0 or total_ratings == 0:
        return 1.0
    p_bar = p_sum / n_subjects
    p_e = sum((p / total_ratings) ** 2 for p in cat_props.values())
    return 1.0 if abs(1.0 - p_e) < 1e-10 else (p_bar - p_e) / (1.0 - p_e)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random_ensembles(spark, seed):
    rng = random.Random(seed)
    models = ["m1", "m2", "m3"]
    texts = ["alpha", "Beta", "gamma", "Delta", "epsilon"]
    types = ["PER", "ORG", "LOC"]
    batch = {}
    for e in range(8):
        per_model = {}
        for m in models:
            ents = [
                (t if rng.random() < 0.7 else t.upper(), rng.choice(types))
                for t in texts
                if rng.random() < 0.7
            ]
            per_model[m] = ents
        batch[f"e{e}"] = per_model

    rows = _flat(batch)
    preds = _preds(spark, rows)
    roster = spark.createDataFrame(
        [(e, m) for e in batch for m in models],
        "example_id string, model_name string",
    )

    # per-example rates
    got = {
        r.example_id: r for r in single_example_analysis(preds, roster).collect()
    }
    total_agreed = total_ents = 0
    for e, ms in batch.items():
        agreed, disagreed = _ref_single(ms)
        total_agreed += len(agreed)
        total_ents += len(agreed) + len(disagreed)
        exp_rate = (
            len(agreed) / (len(agreed) + len(disagreed))
            if agreed or disagreed
            else 1.0
        )
        assert got[e].agreement_rate == pytest.approx(exp_rate), e
        assert got[e].n_agreed == len(agreed)
        assert got[e].n_disagreed == len(disagreed)

    rep = ensemble_report(preds, roster).collect()[0]
    exp_overall = total_agreed / total_ents if total_ents else 1.0
    assert rep.overall_agreement_rate == pytest.approx(exp_overall)
    assert rep.total_entities == total_ents
    assert rep.total_examples == 8
    assert rep.fleiss_kappa == pytest.approx(_ref_kappa(batch), rel=1e-12)

    # pairwise Jaccard on raw pairs
    pw = {
        (r.model_a, r.model_b): r.agreement
        for r in pairwise_agreement(preds, roster).collect()
    }
    for i, a in enumerate(models):
        for b in models[i + 1:]:
            inter = uni = 0
            for ms in batch.values():
                sa, sb = set(ms[a]), set(ms[b])
                inter += len(sa & sb)
                uni += len(sa | sb)
            exp = inter / uni if uni else 1.0
            assert pw[(a, b)] == pytest.approx(exp), (a, b)

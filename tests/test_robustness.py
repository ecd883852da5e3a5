"""NER robustness eval (reference: anno/src/eval/robustness.rs).

Layers:

1. transcribed reference unit tests (robustness.rs:627-698);
2. bit-exactness of the xorshift RNG against an independent
   reimplementation of the Rust semantics;
3. distributed fan-out parity: `perturbed_corpus` through Spark must
   equal driver-side `generate_variants` row for row at any
   parallelism (the RNG is reseeded per call from the text, so this
   is a real determinism claim, not a trivial one);
4. pure-python differential of the relational report math
   (per_case_metrics / robustness_report / perturbation_breakdown)
   against a literal transcription of evaluate() (robustness.rs:392-499);
5. end-to-end over planted pages with controlled FP/FN and a pinned
   deterministic regression floor.
"""

from __future__ import annotations

import pytest

from anno_spark.eval.robustness import (
    DEFAULT_PERTURBATIONS,
    HOMOGLYPHS,
    SimpleRng,
    apply_perturbation,
    generate_variants,
    robustness_grade,
)

U64 = (1 << 64) - 1


# ---------------------------------------------------------------- layer 1
# transcribed from robustness.rs:627-698


def test_typo_swap_nonempty():
    # robustness.rs:631-642 (intensity 0.5)
    out = apply_perturbation("hello world", "TypoSwap", intensity=0.5)
    assert out != ""


def test_case_upper():
    assert apply_perturbation("Hello World", "CaseUpper") == "HELLO WORLD"


def test_case_lower():
    assert apply_perturbation("Hello World", "CaseLower") == "hello world"


def test_punctuation_remove():
    assert apply_perturbation("Hello, World!", "PunctuationRemove") == "Hello World"


def test_generate_variants_contains_none():
    variants = generate_variants("Test text")
    assert variants
    assert any(p == "None" for p, _ in variants)
    # None arm is the identity (robustness.rs:207)
    assert dict(variants)["None"] == "Test text"


def test_homoglyph_table():
    # robustness.rs:676-679 — Cyrillic а for Latin a, identity otherwise
    assert HOMOGLYPHS["a"] == "а"
    assert "z" not in HOMOGLYPHS


def test_robustness_grades():
    # robustness.rs:682-688
    assert robustness_grade(0.98) == "Excellent robustness"
    assert robustness_grade(0.90) == "Good robustness"
    assert robustness_grade(0.75) == "Moderate robustness"
    assert robustness_grade(0.60) == "Poor robustness"
    assert robustness_grade(0.30) == "Very poor robustness"


# ---------------------------------------------------------------- layer 2


def _rust_xorshift_seq(seed: int, n: int) -> list[int]:
    """Independent transcription of SimpleRng (robustness.rs:40-73)."""
    state = seed if seed >= 1 else 1
    out = []
    for _ in range(n):
        x = state
        x = (x ^ (x << 13)) & U64
        x = x ^ (x >> 7)
        x = (x ^ (x << 17)) & U64
        state = x
        out.append(x)
    return out


def test_rng_bit_exact():
    for seed in (1, 42, 0, 2**63, U64):
        rng = SimpleRng(seed)
        got = [rng.next() for _ in range(50)]
        assert got == _rust_xorshift_seq(seed, 50)


def test_rng_zero_seed_clamped_to_one():
    # seed.max(1) — robustness.rs:46
    assert SimpleRng(0).next() == SimpleRng(1).next()


def test_seeding_is_byte_length_of_text():
    # seed ^ text.len() where len is BYTES (robustness.rs:205)
    a = apply_perturbation("café", "UnicodeHomoglyph", seed=7, intensity=1.0)
    # same byte length (5) → same RNG stream as any 5-byte text
    rng = SimpleRng(7 ^ 5)
    expect = "".join(
        HOMOGLYPHS.get(c, c) if rng.gen_f64() < 1.0 else c for c in "café"
    )
    assert a == expect


def test_determinism_and_distinct_arms():
    text = "Barack Obama visited Paris, France on Jan 5."
    v1 = dict(generate_variants(text))
    v2 = dict(generate_variants(text))
    assert v1 == v2
    assert set(v1) == set(DEFAULT_PERTURBATIONS)
    # at least the case arms and punctuation genuinely differ
    assert v1["CaseUpper"] == text.upper()
    assert v1["CaseLower"] == text.lower()
    assert "," not in v1["PunctuationRemove"]


def test_unknown_perturbation_raises():
    with pytest.raises(ValueError):
        apply_perturbation("x", "NotAPerturbation")


# ---------------------------------------------------------------- layer 4
# pure-python transcription of evaluate()'s aggregation
# (robustness.rs:392-499) used as the differential oracle


def _simple_metrics(predicted, gold):
    # compute_simple_metrics (robustness.rs:570-605)
    correct = sum(
        1
        for pt, ps in predicted
        if any(gt == pt and gs.lower() == ps.lower() for gt, gs in gold)
    )
    p = correct / len(predicted) if predicted else 0.0
    r = correct / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
    return p, r, f1


def _reference_evaluate(case_rows):
    """case_rows: {(url, perturbation): (preds, gold)} with
    preds/gold = [(entity_type, surface)]. Returns the RobustnessResults
    dict exactly as robustness.rs:415-499 computes it."""
    by_pert: dict[str, list[tuple[float, float, float]]] = {}
    urls = set()
    for (url, pert), (preds, gold) in case_rows.items():
        urls.add(url)
        by_pert.setdefault(pert, []).append(_simple_metrics(preds, gold))
    agg = {
        name: (
            sum(f for _, _, f in ms) / len(ms),
            sum(p for p, _, _ in ms) / len(ms),
            sum(r for _, r, _ in ms) / len(ms),
            len(ms),
        )
        for name, ms in by_pert.items()
    }
    baseline = agg.get("None", (0.0,))[0]
    others = {k: v for k, v in agg.items() if k != "None"}
    # ties broken lexicographically (port's documented determinism choice)
    worst = (
        min(others.items(), key=lambda kv: (kv[1][0], kv[0]))[0]
        if others
        else "None"
    )
    best = max(agg.items(), key=lambda kv: (kv[1][0], kv[0]))[0] if agg else "None"
    avg_pert = (
        sum(v[0] for v in others.values()) / len(others) if others else baseline
    )
    score = avg_pert / baseline if baseline > 0 else 0.0
    breakdown = {
        name: (
            f1,
            p,
            r,
            (f1 - baseline) / baseline if baseline > 0 else 0.0,
            n,
        )
        for name, (f1, p, r, n) in agg.items()
    }
    return {
        "baseline_f1": baseline,
        "avg_perturbed_f1": avg_pert,
        "robustness_score": score,
        "worst_perturbation": worst,
        "best_perturbation": best,
        "total_examples": len(urls),
        "breakdown": breakdown,
    }


# ---------------------------------------------------------------- spark


@pytest.fixture(scope="module")
def spark():
    from anno_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def test_fanout_matches_driver_variants(spark):
    """perturbed_corpus through Spark ≡ generate_variants on the driver,
    at two parallelism levels."""
    from anno_spark.eval.robustness import perturbed_corpus
    from anno_spark.sources.pages import synthesize_pages

    for parts in (1, 4):
        cases = synthesize_pages(spark, 10, partitions=parts).select("url", "text")
        got = {
            (r.url, r.perturbation): r.text
            for r in perturbed_corpus(cases).collect()
        }
        rows = cases.collect()
        assert len(got) == len(rows) * len(DEFAULT_PERTURBATIONS)
        for row in rows:
            for pert, text in generate_variants(row.text):
                assert got[(row.url, pert)] == text, (row.url, pert)


def _planted_frames(spark):
    """4 cases with hand-built preds/gold exercising every metric quirk:
    duplicate predictions, case-insensitive match, FP, FN, empty gold,
    empty preds."""
    cases = [
        ("u1", "t1"),
        ("u2", "t2"),
        ("u3", "t3"),
        ("u4", "t4"),
    ]
    gold = [
        # (url, surface, type)
        ("u1", "Alice", "PER"),
        ("u1", "Acme", "ORG"),
        ("u2", "Bob", "PER"),
        ("u4", "Carol", "PER"),  # u3 has empty gold
    ]
    preds = [
        # (url, perturbation, surface, type)
        ("u1", "None", "ALICE", "PER"),      # case-insensitive hit
        ("u1", "None", "alice", "PER"),      # duplicate — counts again
        ("u1", "None", "Acme", "ORG"),
        ("u1", "CaseUpper", "Acme", "ORG"),  # partial recall
        ("u2", "None", "Bob", "PER"),
        ("u2", "None", "Eve", "PER"),        # FP
        ("u2", "CaseUpper", "Bob", "LOC"),   # wrong type — no match
        ("u3", "None", "Ghost", "ORG"),      # empty gold → P=R=0
        # u4: no predictions at all in either arm → grid completion
    ]
    cases_df = spark.createDataFrame(cases, "url string, text string")
    gold_df = spark.createDataFrame(
        gold, "url string, text string, entity_type string"
    )
    preds_df = spark.createDataFrame(
        preds, "url string, perturbation string, text string, entity_type string"
    )
    return cases_df, gold_df, preds_df, cases, gold, preds


def test_report_differential_vs_reference_transcription(spark):
    from anno_spark.eval.robustness import (
        _complete_cases,
        per_case_metrics,
        perturbation_breakdown,
        robustness_report,
    )

    cases_df, gold_df, preds_df, cases, gold, preds = _planted_frames(spark)
    perts = ("None", "CaseUpper")
    metrics = _complete_cases(per_case_metrics(preds_df, gold_df), cases_df, perts)
    report = robustness_report(metrics).collect()[0]
    breakdown = {
        r.perturbation: (r.f1, r.precision, r.recall, r.relative_change, r["count"])
        for r in perturbation_breakdown(metrics).collect()
    }

    # reference oracle over the same planted rows
    case_rows = {}
    for url, _ in cases:
        g = [(t, s) for u, s, t in gold if u == url]
        for pert in perts:
            p = [
                (t, s)
                for u, pp, s, t in preds
                if u == url and pp == pert
            ]
            case_rows[(url, pert)] = (p, g)
    want = _reference_evaluate(case_rows)

    assert report.baseline_f1 == pytest.approx(want["baseline_f1"])
    assert report.avg_perturbed_f1 == pytest.approx(want["avg_perturbed_f1"])
    assert report.robustness_score == pytest.approx(want["robustness_score"])
    assert report.worst_perturbation == want["worst_perturbation"]
    assert report.best_perturbation == want["best_perturbation"]
    assert report.total_examples == want["total_examples"]
    assert set(breakdown) == set(want["breakdown"])
    for name, (f1, p, r, rc, n) in want["breakdown"].items():
        gf1, gp, gr, grc, gn = breakdown[name]
        assert gf1 == pytest.approx(f1), name
        assert gp == pytest.approx(p), name
        assert gr == pytest.approx(r), name
        assert grc == pytest.approx(rc), name
        assert gn == n, name


def test_report_without_none_arm(spark):
    """baseline absent → baseline_f1 = 0.0, robustness_score = 0.0
    (robustness.rs:421-423, 478-482 unwrap_or paths)."""
    from anno_spark.eval.robustness import (
        _complete_cases,
        per_case_metrics,
        robustness_report,
    )

    cases_df, gold_df, preds_df, *_ = _planted_frames(spark)
    perts = ("CaseUpper",)
    metrics = _complete_cases(
        per_case_metrics(preds_df.where("perturbation = 'CaseUpper'"), gold_df),
        cases_df,
        perts,
    )
    r = robustness_report(metrics).collect()[0]
    assert r.baseline_f1 == 0.0
    assert r.robustness_score == 0.0
    assert r.worst_perturbation == "CaseUpper"


def test_end_to_end_on_synthetic_pages(spark):
    """Full evaluate_robustness over the deterministic corpus with the
    engine's own extraction as gold: baseline arm must be perfect, the
    whole-report shape stable, and the robustness score pinned (the
    extractor and corpus are deterministic — drift = regression)."""
    from anno_spark.eval.robustness import evaluate_robustness
    from anno_spark.operators.extract import extract_documents, mentions_table
    from anno_spark.sources.pages import synthesize_pages

    cases = synthesize_pages(spark, 12, partitions=2).select("url", "text")
    gold = mentions_table(extract_documents(cases)).select(
        "url", "text", "entity_type"
    )
    report_df, breakdown_df = evaluate_robustness(cases, gold)
    r = report_df.collect()[0]
    assert r.baseline_f1 == pytest.approx(1.0)
    assert r.best_perturbation == "None"
    assert r.total_examples == 12
    # pinned regression floor (observed 0.6315 on this corpus/extractor)
    assert r.robustness_score == pytest.approx(0.6315229139203151, abs=1e-9)
    assert r.worst_perturbation == "CaseUpper"
    rows = {x.perturbation: x for x in breakdown_df.collect()}
    assert set(rows) == set(DEFAULT_PERTURBATIONS)
    assert rows["None"].relative_change == 0.0
    # whitespace barely hurts; case arms hurt the case-sensitive NER most
    assert rows["WhitespaceExtra"].f1 > 0.9
    assert rows["CaseUpper"].f1 < 0.5

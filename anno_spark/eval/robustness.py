"""NER robustness under text perturbations (reference:
anno/src/eval/robustness.rs:36-625).

The reference perturbs each test sentence with a family of
deterministic corruptions (typos, case, whitespace, punctuation,
unicode homoglyphs/diacritics/zero-width), re-runs the model on every
variant, and reports per-perturbation P/R/F1 plus a robustness score
(avg perturbed F1 / baseline F1, robustness.rs:478-487).

Distributed shape: the perturbation arms are pure functions of
(text, seed, intensity) — the reference's xorshift RNG is seeded
``seed ^ byte_len(text)`` per call (robustness.rs:205), so every
variant is reproducible at any parallelism. The fan-out (one row per
case × perturbation) runs in ONE ``mapInPandas`` alongside nothing
else; extraction over the perturbed corpus is the engine's normal
single fused pass; the simplified match rule (entity type + lowercased
surface equality, robustness.rs:570-585) and every rollup after it are
relational — a semi-join against exploded gold and two small groupBys.

Quirks preserved:

* recall is 0.0 (not 1.0) when gold is empty and precision 0.0 when
  nothing is predicted (robustness.rs:588-599);
* each matching PREDICTION counts once — duplicate predictions of the
  same gold all count as correct (robustness.rs:578-585);
* ``avg_perturbed_f1`` and ``worst_perturbation`` exclude the "None"
  baseline, ``best_perturbation`` includes it (robustness.rs:447-476);
* best/worst tie-break by name (the reference's HashMap iteration
  order is unspecified; lexicographic is the deterministic choice).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

U64 = (1 << 64) - 1


class SimpleRng:
    """xorshift64 (robustness.rs:41-73) — bit-exact."""

    def __init__(self, seed: int):
        self.state = max(seed & U64, 1)

    def next(self) -> int:
        x = self.state
        x = (x ^ (x << 13)) & U64
        x ^= x >> 7
        x = (x ^ (x << 17)) & U64
        self.state = x
        return x

    def gen_f64(self) -> float:
        return self.next() / U64

    def gen_bool(self) -> bool:
        return self.next() % 2 == 0

    def gen_range(self, max_: int) -> int:
        return self.next() % max_ if max_ else 0


# robustness.rs:174-186 — the default evaluator's perturbation set
DEFAULT_PERTURBATIONS = (
    "None", "TypoSwap", "TypoDelete", "CaseUpper", "CaseLower",
    "CaseMixed", "WhitespaceExtra", "PunctuationRemove", "UnicodeHomoglyph",
)

# robustness.rs:541-556
HOMOGLYPHS = {
    "a": "а", "e": "е", "o": "о", "p": "р",
    "c": "с", "A": "А", "E": "Е", "O": "О",
    "P": "Р", "C": "С",
}
# robustness.rs:559-569
DIACRITICS = {"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú", "n": "ñ"}
# robustness.rs:505-517 (rows covered by the reference table)
KEYBOARD = {
    "q": "wa", "w": "qes", "e": "wrd", "r": "etf", "t": "ryg",
    "a": "qsz", "s": "adwx", "d": "sfec", "f": "dgrv", "g": "fhtb",
}

_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


def apply_perturbation(
    text: str, perturbation: str, seed: int = 42, intensity: float = 0.1
) -> str:
    """Exact port of RobustnessEvaluator::apply_perturbation
    (robustness.rs:202-390). RNG seeded per call with
    ``seed ^ byte_len(text)`` (:205 — Rust ``text.len()`` is bytes)."""
    rng = SimpleRng(seed ^ len(text.encode("utf-8")))
    chars = list(text)

    if perturbation == "None":
        return text

    if perturbation == "TypoSwap":
        n = max(int(len(chars) * intensity), 1)
        for _ in range(n):
            if len(chars) >= 2:
                i = rng.gen_range(len(chars) - 1)
                if chars[i].isalpha() and chars[i + 1].isalpha():
                    chars[i], chars[i + 1] = chars[i + 1], chars[i]
        return "".join(chars)

    if perturbation == "TypoInsert":
        out = []
        for i, c in enumerate(chars):
            out.append(c)
            if rng.gen_f64() < intensity and c.isalpha():
                off = 1 if rng.gen_bool() else -1
                try:
                    out.append(chr(ord(c) + off))
                except ValueError:
                    out.append(c)
            if i > 0 and i % 20 == 0 and rng.gen_f64() < 0.1:
                break
        return "".join(out)

    if perturbation == "TypoDelete":
        return "".join(
            c for c in chars if not c.isalpha() or rng.gen_f64() > intensity
        )

    if perturbation == "TypoKeyboard":
        out = []
        for c in chars:
            if c.isalpha() and rng.gen_f64() < intensity:
                lo = c.lower()
                if lo in KEYBOARD:
                    n = KEYBOARD[lo][rng.gen_range(len(KEYBOARD[lo]))]
                    out.append(n.upper() if c.isupper() else n)
                    continue
            out.append(c)
        return "".join(out)

    if perturbation == "CaseUpper":
        return text.upper()
    if perturbation == "CaseLower":
        return text.lower()
    if perturbation == "CaseTitle":
        return " ".join(
            w[:1].upper() + w[1:].lower() for w in text.split()
        )
    if perturbation == "CaseMixed":
        return "".join(
            c.upper() if i % 2 == 0 else c.lower() for i, c in enumerate(chars)
        )

    if perturbation == "WhitespaceExtra":
        return "".join(
            "  " if c == " " and rng.gen_f64() < intensity * 3.0 else c
            for c in chars
        )

    if perturbation == "WhitespaceRemove":
        words = text.split()
        out = []
        for i, w in enumerate(words):
            out.append(w)
            if i < len(words) - 1 and rng.gen_f64() > intensity:
                out.append(" ")
        return "".join(out)

    if perturbation == "WhitespaceNewline":
        return "".join(
            "\n" if c == " " and rng.gen_f64() < intensity else c for c in chars
        )

    if perturbation == "PunctuationRemove":
        return "".join(c for c in chars if c not in _PUNCT)

    if perturbation == "PunctuationExtra":
        return "".join(
            c * 2 if c in _PUNCT and rng.gen_f64() < intensity * 3.0 else c
            for c in chars
        )

    if perturbation == "UnicodeHomoglyph":
        return "".join(
            HOMOGLYPHS.get(c, c) if rng.gen_f64() < intensity else c
            for c in chars
        )

    if perturbation == "UnicodeDiacritics":
        return "".join(
            DIACRITICS.get(c.lower(), c)
            if c.isalpha() and rng.gen_f64() < intensity
            else c
            for c in chars
        )

    if perturbation == "UnicodeZeroWidth":
        zwsp = "\u200b"
        return "".join(
            c + zwsp if rng.gen_f64() < intensity * 0.5 else c for c in chars
        )

    raise ValueError(f"unknown perturbation {perturbation!r}")


def generate_variants(
    text: str,
    perturbations: tuple[str, ...] = DEFAULT_PERTURBATIONS,
    seed: int = 42,
    intensity: float = 0.1,
) -> list[tuple[str, str]]:
    """RobustnessEvaluator::generate_variants (robustness.rs:195-200)."""
    return [(p, apply_perturbation(text, p, seed, intensity)) for p in perturbations]


def robustness_grade(score: float) -> str:
    """robustness.rs:607-619."""
    if score >= 0.95:
        return "Excellent robustness"
    if score >= 0.85:
        return "Good robustness"
    if score >= 0.70:
        return "Moderate robustness"
    if score >= 0.50:
        return "Poor robustness"
    return "Very poor robustness"


VARIANT_SCHEMA = "url string, perturbation string, text string"


def perturbed_corpus(
    cases: DataFrame,
    perturbations: tuple[str, ...] = DEFAULT_PERTURBATIONS,
    seed: int = 42,
    intensity: float = 0.1,
) -> DataFrame:
    """(url, text) → (url, perturbation, perturbed text): the case ×
    perturbation fan-out as one Arrow-batched pass. Output size is
    |cases| × |perturbations| rows — the explosion factor is the fixed,
    small perturbation count, never data-dependent."""
    perts = tuple(perturbations)

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, kinds, texts = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                for p in perts:
                    urls.append(url)
                    kinds.append(p)
                    texts.append(apply_perturbation(text, p, seed, intensity))
            yield pd.DataFrame({"url": urls, "perturbation": kinds, "text": texts})

    return cases.select("url", "text").mapInPandas(fan_out, schema=VARIANT_SCHEMA)


def per_case_metrics(preds: DataFrame, gold: DataFrame) -> DataFrame:
    """(url, perturbation)-level simplified P/R/F1
    (compute_simple_metrics, robustness.rs:570-605). ``preds``:
    (url, perturbation, text, entity_type); ``gold``: (url, text,
    entity_type). A prediction is correct when ANY same-url gold has
    the same type and case-insensitively equal surface."""
    g = gold.select(
        F.col("url").alias("g_url"),
        F.lower(F.col("text")).alias("g_text"),
        F.col("entity_type").alias("g_type"),
    ).distinct()
    matched = preds.join(
        g,
        (preds["url"] == g["g_url"])
        & (F.lower(preds["text"]) == g["g_text"])
        & (preds["entity_type"] == g["g_type"]),
        "left_semi",
    )
    n_pred = preds.groupBy("url", "perturbation").agg(
        F.count("*").alias("n_pred")
    )
    n_correct = matched.groupBy("url", "perturbation").agg(
        F.count("*").alias("n_correct")
    )
    n_gold = gold.groupBy("url").agg(F.count("*").alias("n_gold"))
    m = (
        n_pred.join(n_correct, ["url", "perturbation"], "left")
        .join(n_gold, "url", "left")
        .fillna({"n_correct": 0, "n_gold": 0})
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")).otherwise(
        F.lit(0.0)
    )
    r = F.when(F.col("n_gold") > 0, F.col("n_correct") / F.col("n_gold")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return m.select(
        "url",
        "perturbation",
        p.alias("precision"),
        r.alias("recall"),
        f1.alias("f1"),
    )


def _complete_cases(metrics: DataFrame, cases: DataFrame, perts) -> DataFrame:
    """A variant whose extraction found NOTHING emits no mention rows —
    the reference still scores it (P=R=F1=0, robustness.rs:397-410), so
    re-attach the full case × perturbation grid with zero rows."""
    grid = cases.select("url").crossJoin(
        F.broadcast(
            cases.sparkSession.createDataFrame(
                [(p,) for p in perts], "perturbation string"
            )
        )
    )
    return (
        grid.join(metrics, ["url", "perturbation"], "left")
        .fillna({"precision": 0.0, "recall": 0.0, "f1": 0.0})
    )


def robustness_report(case_metrics: DataFrame) -> DataFrame:
    """ONE-row RobustnessResults (robustness.rs:415-499): baseline_f1,
    avg_perturbed_f1 (excl. None), robustness_score, worst (excl.
    None) / best (incl. None) perturbation, total_examples; plus the
    per-perturbation breakdown via :func:`perturbation_breakdown`."""
    per_pert = case_metrics.groupBy("perturbation").agg(
        F.avg("f1").alias("f1"), F.count("*").alias("count")
    )
    # one row even when "None" was not run: baseline_f1 = 0.0 then
    # (robustness.rs:421-423 unwrap_or(0.0))
    base = per_pert.agg(
        F.coalesce(
            F.avg(F.when(F.col("perturbation") == "None", F.col("f1"))),
            F.lit(0.0),
        ).alias("baseline_f1")
    )
    others = per_pert.where(F.col("perturbation") != "None")
    agg = others.agg(
        F.avg("f1").alias("avg_perturbed_f1"),
        # empty perturbed set → "None" (robustness.rs:458 unwrap_or)
        F.coalesce(
            F.min_by("perturbation", F.struct(F.col("f1"), F.col("perturbation"))),
            F.lit("None"),
        ).alias("worst_perturbation"),
    )
    best = per_pert.agg(
        F.coalesce(
            F.max_by("perturbation", F.struct(F.col("f1"), F.col("perturbation"))),
            F.lit("None"),
        ).alias("best_perturbation")
    )
    total = case_metrics.select("url").distinct().agg(
        F.count("*").alias("total_examples")
    )
    return (
        base.crossJoin(agg)
        .crossJoin(best)
        .crossJoin(total)
        .select(
            "baseline_f1",
            F.coalesce("avg_perturbed_f1", "baseline_f1").alias("avg_perturbed_f1"),
            F.when(
                F.col("baseline_f1") > 0,
                F.coalesce("avg_perturbed_f1", "baseline_f1")
                / F.col("baseline_f1"),
            )
            .otherwise(F.lit(0.0))
            .alias("robustness_score"),
            "worst_perturbation",
            "best_perturbation",
            "total_examples",
        )
    )


def perturbation_breakdown(case_metrics: DataFrame) -> DataFrame:
    """Per-perturbation PerturbationMetrics rows (robustness.rs:424-446):
    f1/precision/recall averages, relative_change vs baseline, count."""
    per_pert = case_metrics.groupBy("perturbation").agg(
        F.avg("f1").alias("f1"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.count("*").alias("count"),
    )
    base = per_pert.agg(
        F.coalesce(
            F.avg(F.when(F.col("perturbation") == "None", F.col("f1"))),
            F.lit(0.0),
        ).alias("_base")
    )
    return per_pert.crossJoin(F.broadcast(base)).select(
        "perturbation",
        "f1",
        "precision",
        "recall",
        F.when(F.col("_base") > 0, (F.col("f1") - F.col("_base")) / F.col("_base"))
        .otherwise(F.lit(0.0))
        .alias("relative_change"),
        "count",
    )


def evaluate_robustness(
    cases: DataFrame,
    gold: DataFrame,
    perturbations: tuple[str, ...] = DEFAULT_PERTURBATIONS,
    seed: int = 42,
    intensity: float = 0.1,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end (RobustnessEvaluator::evaluate, robustness.rs:392-499):
    perturb → ONE extraction pass over all variants → per-case metrics →
    (one-row report, per-perturbation breakdown). ``cases``: (url,
    text); ``gold``: (url, text, entity_type)."""
    from anno_spark.operators.extract import extract_documents, mentions_table

    variants = perturbed_corpus(cases, perturbations, seed, intensity)
    # composite url keeps the engine's one-url-one-document contract;
    # \x1f (unit separator) cannot appear in a url
    sep = "\x1f"
    keyed = variants.select(
        F.concat_ws(sep, "url", "perturbation").alias("url"), "text"
    )
    mentions = mentions_table(extract_documents(keyed)).select(
        F.substring_index("url", sep, 1).alias("url"),
        F.substring_index("url", sep, -1).alias("perturbation"),
        "text",
        "entity_type",
    )
    metrics = _complete_cases(
        per_case_metrics(mentions, gold), cases, tuple(perturbations)
    )
    return robustness_report(metrics), perturbation_breakdown(metrics)

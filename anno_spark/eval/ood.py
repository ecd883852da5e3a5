"""Out-of-distribution entity detection (reference:
anno/src/eval/ood_detection.rs:1-465).

The reference fits a detector on training entity surfaces — a
character-trigram vocabulary plus an exact lowercased-surface set —
then flags test entities by four methods (check_ood,
ood_detection.rs:191-228): ``low_vocab_coverage`` (< 0.5 of the
entity's trigrams seen in training), ``unseen_entity`` (surface not in
training AND coverage < 0.8), ``low_confidence`` (model confidence
below threshold, only when a confidence is supplied), and
``unusual_characters`` (zero-width/BOM codepoints). Any flag ⇒ OOD.

Distributed shape: "fit" produces two DataFrames — the trigram
vocabulary and the known-surface set — which at web scale are tables
derived from the training mention corpus by one distinct each, not
driver-side sets. Scoring explodes test surfaces into trigrams
JVM-side (``sequence``/``transform`` — no Python in the hot path),
marks each against the vocabulary with a left join (broadcastable
when the vocabulary is small; plain shuffled join otherwise — the
caller controls via ``broadcast_vocab``), and rolls coverage back up
with one groupBy per distinct surface. Identical surfaces share one
status row internally and re-attach to every input row, so a skewed
test set (one hot surface repeated 10⁸×) costs one status
computation, not 10⁸.

Quirks preserved:

* n-grams are CODEPOINT trigrams of the lowercased text; texts
  shorter than the n-gram size contribute themselves as a single
  n-gram — including the EMPTY string for empty text
  (extract_ngrams, ood_detection.rs:308-319);
* empty n-gram list ⇒ coverage 1.0 (ood_detection.rs:321-326 — not
  reachable through extract_ngrams, preserved in the SQL via
  coalesce);
* ``unseen_entity`` requires BOTH no exact match and coverage < 0.8
  ("unknown but similar = OK", ood_detection.rs:203-209);
* ``avg_ood_confidence``/``avg_id_confidence`` average only entities
  that HAVE a confidence; empty set ⇒ 0.0 (ood_detection.rs:279-289);
* ``coverage_ratio`` is 1.0 on an empty test vocabulary
  (ood_detection.rs:270-274);
* the reference samples the first 10 OOD entities in input order
  (ood_detection.rs:257-259); a DataFrame has no input order, so the
  port takes the 10 lexicographically-smallest distinct surfaces.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ood_detection.rs:55-65
DEFAULT_CONFIDENCE_THRESHOLD = 0.5
DEFAULT_NGRAM_SIZE = 3
DEFAULT_VOCAB_COVERAGE_THRESHOLD = 0.5
UNSEEN_COVERAGE_CEILING = 0.8  # ood_detection.rs:206

# '\u{200B}'..='\u{200F}' | '\u{FEFF}' | '\u{2060}' (ood_detection.rs:335-345)
_UNUSUAL_RE = "[\\x{200B}-\\x{200F}\\x{FEFF}\\x{2060}]"


@dataclass(frozen=True)
class OODConfig:
    """OODConfig (ood_detection.rs:42-65)."""

    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
    ngram_size: int = DEFAULT_NGRAM_SIZE
    vocab_coverage_threshold: float = DEFAULT_VOCAB_COVERAGE_THRESHOLD


def _ngram_col(col: str, n: int):
    """Codepoint n-grams of lower(col) as an array column, entirely
    JVM-side. Mirrors extract_ngrams (ood_detection.rs:308-319): short
    strings (len < n) yield themselves as one n-gram."""
    lo = f"lower({col})"
    return F.expr(
        f"CASE WHEN length({lo}) < {n} THEN array({lo}) "
        f"ELSE transform(sequence(1, length({lo}) - {n - 1}), "
        f"i -> substring({lo}, i, {n})) END"
    )


def fit_ood(train: DataFrame, ngram_size: int = DEFAULT_NGRAM_SIZE) -> tuple[DataFrame, DataFrame]:
    """OODDetector::fit (ood_detection.rs:152-166) as two DataFrames:
    (trigram vocabulary, known lowercased surfaces). ``train`` needs a
    ``text`` column; duplicates collapse — the reference's detector
    only membership-tests, so frequencies are not materialized."""
    vocab = (
        train.select(F.explode(_ngram_col("text", ngram_size)).alias("ngram"))
        .distinct()
    )
    known = train.select(F.lower("text").alias("known_text")).distinct()
    return vocab, known


def ood_status(
    test: DataFrame,
    vocab: DataFrame,
    known: DataFrame,
    config: OODConfig = OODConfig(),
    broadcast_vocab: bool = True,
) -> DataFrame:
    """check_ood over a whole test frame (ood_detection.rs:191-228).

    ``test``: (text, confidence double nullable, …passthrough cols).
    Adds vocab_coverage, flagged_by (array, method order as in the
    reference), is_ood. Set ``broadcast_vocab=False`` when the training
    vocabulary exceeds the broadcast budget — the joins then shuffle on
    the n-gram / surface keys.
    """
    n = config.ngram_size
    maybe_b = F.broadcast if broadcast_vocab else (lambda df: df)

    distinct_texts = test.select("text").distinct()
    grams = distinct_texts.select(
        "text", F.explode(_ngram_col("text", n)).alias("ngram")
    )
    marked = grams.join(
        maybe_b(vocab.withColumn("_seen", F.lit(1))), "ngram", "left"
    )
    coverage = marked.groupBy("text").agg(
        F.coalesce(
            F.sum(F.coalesce(F.col("_seen"), F.lit(0))) / F.count("*"), F.lit(1.0)
        ).alias("vocab_coverage")
    )
    status = coverage.join(
        maybe_b(known.withColumn("_known", F.lit(1))),
        F.lower(F.col("text")) == F.col("known_text"),
        "left",
    ).select(
        "text",
        "vocab_coverage",
        (F.col("_known").isNotNull()).alias("_is_known"),
        F.col("text").rlike(_UNUSUAL_RE).alias("_unusual"),
    )

    out = test.join(status, "text", "left")
    conf = F.col("confidence") if "confidence" in test.columns else F.lit(None).cast("double")
    flags = F.array_compact(
        F.array(
            F.when(
                F.col("vocab_coverage") < config.vocab_coverage_threshold,
                F.lit("low_vocab_coverage"),
            ),
            F.when(
                (~F.col("_is_known"))
                & (F.col("vocab_coverage") < UNSEEN_COVERAGE_CEILING),
                F.lit("unseen_entity"),
            ),
            F.when(conf < config.confidence_threshold, F.lit("low_confidence")),
            F.when(F.col("_unusual"), F.lit("unusual_characters")),
        )
    )
    return (
        out.withColumn("flagged_by", flags)
        .withColumn("is_ood", F.size("flagged_by") > 0)
        .drop("_is_known", "_unusual")
    )


def ood_analyze(
    test: DataFrame,
    vocab: DataFrame,
    known: DataFrame,
    config: OODConfig = OODConfig(),
    broadcast_vocab: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """OODDetector::analyze (ood_detection.rs:231-304).

    Returns ``(summary, by_method)``: summary is ONE row with
    total_entities, ood_count, ood_rate, avg_ood_confidence,
    avg_id_confidence, train_vocab_size, test_vocab_size,
    unseen_ngrams, coverage_ratio, sample_ood_entities (≤10);
    by_method is (method, count).
    """
    status = ood_status(test, vocab, known, config, broadcast_vocab)

    conf = (
        F.col("confidence")
        if "confidence" in test.columns
        else F.lit(None).cast("double")
    )
    core = status.agg(
        F.count("*").alias("total_entities"),
        F.coalesce(F.sum(F.when(F.col("is_ood"), 1).otherwise(0)), F.lit(0)).alias(
            "ood_count"
        ),
        F.coalesce(F.avg(F.when(F.col("is_ood"), conf)), F.lit(0.0)).alias(
            "avg_ood_confidence"
        ),
        F.coalesce(F.avg(F.when(~F.col("is_ood"), conf)), F.lit(0.0)).alias(
            "avg_id_confidence"
        ),
    ).withColumn(
        "ood_rate",
        F.when(
            F.col("total_entities") > 0,
            F.col("ood_count") / F.col("total_entities"),
        ).otherwise(F.lit(0.0)),
    )

    test_ngrams = (
        test.select(F.explode(_ngram_col("text", config.ngram_size)).alias("ngram"))
        .distinct()
    )
    vstats = (
        test_ngrams.join(
            (F.broadcast(vocab) if broadcast_vocab else vocab).withColumn(
                "_seen", F.lit(1)
            ),
            "ngram",
            "left",
        )
        .agg(
            F.count("*").alias("test_vocab_size"),
            F.coalesce(
                F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0)), F.lit(0)
            ).alias("unseen_ngrams"),
        )
        .withColumn(
            "coverage_ratio",
            F.when(
                F.col("test_vocab_size") > 0,
                1.0 - F.col("unseen_ngrams") / F.col("test_vocab_size"),
            ).otherwise(F.lit(1.0)),
        )
    )
    train_size = vocab.agg(F.count("*").alias("train_vocab_size"))

    # ≤10 sample surfaces via distributed top-k (TakeOrdered), never a
    # full collect_set of the OOD population (ood_detection.rs:257-259
    # takes the first 10 in input order; see module docstring)
    samples = (
        status.where("is_ood")
        .select("text")
        .distinct()
        .orderBy("text")
        .limit(10)
        .agg(F.sort_array(F.collect_list("text")).alias("sample_ood_entities"))
    )

    summary = core.crossJoin(vstats).crossJoin(train_size).crossJoin(samples).select(
        "total_entities",
        "ood_count",
        "ood_rate",
        "avg_ood_confidence",
        "avg_id_confidence",
        "train_vocab_size",
        "test_vocab_size",
        "unseen_ngrams",
        "coverage_ratio",
        "sample_ood_entities",
    )
    by_method = (
        status.select(F.explode("flagged_by").alias("method"))
        .groupBy("method")
        .agg(F.count("*").alias("count"))
    )
    return summary, by_method


def ood_rate_grade(rate: float) -> str:
    """ood_rate_grade (ood_detection.rs:360-372)."""
    if rate < 0.05:
        return "Very low OOD (well-covered domain)"
    if rate < 0.15:
        return "Low OOD (mostly covered)"
    if rate < 0.30:
        return "Moderate OOD (some gaps)"
    if rate < 0.50:
        return "High OOD (significant gaps)"
    return "Very high OOD (major domain shift)"

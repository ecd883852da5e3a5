"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, fingerprinting, language-ID.

Everything except language-ID is pure JVM expression (whole-stage
codegen; no Python in the hot path). Language-ID reuses the T3
pandas UDF (anno_spark.core.textops.detect_language).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Engine-independent whitespace class (ADVICE r01): Java's (?U)\s and
# RE2's \s disagree on Unicode whitespace (NBSP etc.), so the token /
# fingerprint contract pins an explicit ASCII class both here and in the
# DuckDB oracles.
WS_CLASS = r"[ \t\n\r\f\x0B]+"


def token_count(col: Column) -> Column:
    """ASCII-whitespace tokens (explicit class; no empties)."""
    arr = F.split(F.trim(col), WS_CLASS)
    return F.size(F.filter(arr, lambda w: w != F.lit("")))


def line_count(col: Column) -> Column:
    return F.size(F.split(col, "\n"))


# BPE-ish pre-tokenizer (GPT-2-style classes, simplified to be identical
# under Java regex and RE2 so the DuckDB oracle can run the same pattern:
# no lookahead, explicit ASCII whitespace): a token is an optional-space
# letter run, an optional-space digit run, or an optional-space
# punctuation run.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0B]+"


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex (the
    usual first-order proxy for LLM token budgeting; pure codegen)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


# Polynomial rolling hash (Rabin-Karp): h = Σ c_i · B^(n-i) mod P.
# Capped at ROLL_MAX_CHARS — fingerprint quality saturates long before a
# 100 KB page, and the per-row char array in the fold is bounded.
ROLL_BASE = 31
ROLL_MOD = 1_000_000_007
ROLL_MAX_CHARS = 4096


def rolling_fingerprint(col: Column) -> Column:
    """Rolling-hash document fingerprint over the first ROLL_MAX_CHARS
    chars (codepoint fold, JVM higher-order aggregate — no Python)."""
    chars = F.split(F.substring(col, 1, ROLL_MAX_CHARS), "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != F.lit("")),
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(acc * ROLL_BASE + F.ascii(ch), F.lit(ROLL_MOD)),
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token-budget + fingerprint profile: whitespace
    tokens, BPE-ish tokens, md5 normalized fingerprint, rolling hash."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("ws_tokens"),
        bpe_token_count(t).alias("bpe_tokens"),
        normalized_fingerprint(t).alias("fingerprint"),
        rolling_fingerprint(t).alias("rolling_hash"),
    )


def char_class_ratio(col: Column, pattern: str) -> Column:
    """Fraction of characters matching the regex char class."""
    n = F.length(col)
    kept = F.length(F.regexp_replace(col, pattern, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - kept).cast("double") / n.cast("double")
    )


def normalized_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lowercased text."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), WS_CLASS, " ")))


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document size/quality profile (all codegen'd expressions)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        line_count(t).alias("n_lines"),
        F.round(char_class_ratio(t, "[a-zA-Z]"), 6).alias("alpha_ratio"),
        F.round(char_class_ratio(t, "[0-9]"), 6).alias("digit_ratio"),
        F.round(char_class_ratio(t, r"[.,;:!?'\"]"), 6).alias("punct_ratio"),
        normalized_fingerprint(t).alias("fingerprint"),
    )


# A small English stopword list for the quality score (public knowledge).
_STOPWORDS = (
    "the a an and or of to in is are was were be been it that this for on "
    "with as at by from"
).split()


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: token-length sanity + alpha ratio
    + stopword presence (C4-style quality signals, computed JVM-side)."""
    t = F.col(text_col)
    toks = F.filter(F.split(F.lower(F.trim(t)), WS_CLASS), lambda w: w != F.lit(""))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    mean_tok_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n_tokens.cast("double")
    )
    len_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0).otherwise(0.0)
    alpha = char_class_ratio(t, "[a-zA-Z]")
    stop_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.least(n_stop.cast("double") / F.lit(5.0), F.lit(1.0))
    )
    score = F.round((len_ok + alpha + stop_ratio) / F.lit(3.0), 6)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_signal"),
        score.alias("quality_score"),
    )


def detect_languages(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """T3 language-ID over arbitrary documents (pandas UDF)."""
    from .extract import detect_lang_udf

    return docs.select(
        "doc_id", detect_lang_udf()(F.col(text_col)).alias("detected_lang")
    )

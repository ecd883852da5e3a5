"""Temporal-bias evaluation for NER (reference:
anno/src/eval/temporal_bias.rs:1-674).

Measures recognition-rate differences on person names popular in
different time periods (SSA baby-name data framing): per-decade
recognition rates, the temporal parity gap (max − min across decades),
the historical(pre-1950)-vs-modern(post-2000) gap, and breakdowns by
associated gender and classic-vs-trendy names
(TemporalBiasEvaluator::evaluate, temporal_bias.rs:208-330).

Distributed shape: the name dataset is a fixed pure function (95
rows); recognition is ONE real extraction pass over the generated
sentences (operators/extract.py — the reference calls
``model.extract_entities`` per example, temporal_bias.rs:225-228)
followed by a relational recognized-flag join; every rollup after it
is a groupBy. The same evaluator runs over millions of planted names
unchanged.

Quirks preserved:

* classic names carry D1950s as their nominal peak decade
  (temporal_bias.rs:583-594) — so they land in by_decade / the parity
  gap but in neither the historical (pre-1950) nor modern (post-2000)
  rate;
* the cycled last names collide: "Liam Johnson" exists twice (2010s
  AND 2020s lists, temporal_bias.rs:515-534) and "Robert Johnson"
  twice (1930s trendy AND classic, temporal_bias.rs:444,551) — four
  rows, two distinct full names, each kept as its own example;
* empty groups rate 0.0, not NULL (count_to_rate,
  temporal_bias.rs:296-302); a <2-decade dataset has parity gap 0.0
  (compute_max_gap, temporal_bias.rs:333-344);
* decade keys are the Rust Debug strings ("Pre1900", "D1900s", …,
  "D2020s"), gender keys "Masculine"/"Feminine"/"Neutral".

Port deviation (documented): the reference picks each name's sentence
template with std DefaultHasher (temporal_bias.rs:351-356), a hasher
Rust documents as unstable across releases — there is no canonical
assignment to reproduce. The port selects with md5(full_name) mod 10
over the SAME 10 transcribed templates: equally deterministic,
different assignment.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# temporal_bias.rs:91-108 — Decade -> (midpoint year, historical, modern)
DECADES: dict[str, tuple[int, bool, bool]] = {
    "Pre1900": (1890, True, False),
    "D1900s": (1905, True, False),
    "D1910s": (1915, True, False),
    "D1920s": (1925, True, False),
    "D1930s": (1935, True, False),
    "D1940s": (1945, True, False),
    "D1950s": (1955, False, False),
    "D1960s": (1965, False, False),
    "D1970s": (1975, False, False),
    "D1980s": (1985, False, False),
    "D1990s": (1995, False, False),
    "D2000s": (2005, False, True),
    "D2010s": (2015, False, True),
    "D2020s": (2022, False, True),
}

DECADE_ORDER = list(DECADES)  # chronological; Ord derives from decl order


def midpoint_year(decade: str) -> int:
    return DECADES[decade][0]


def is_historical(decade: str) -> bool:
    """Pre-1950 (temporal_bias.rs:72-82)."""
    return DECADES[decade][1]


def is_modern(decade: str) -> bool:
    """Post-2000 (temporal_bias.rs:85-88)."""
    return DECADES[decade][2]


# temporal_bias.rs:392 — generic last names cycled per decade list
_LAST_NAMES = ("Smith", "Johnson", "Williams", "Brown", "Jones")

# temporal_bias.rs:395-541 — per-decade first-name lists (reference data
# = the spec; SSA-derived). (name, gender) in source order.
_M, _F, _N = "Masculine", "Feminine", "Neutral"
_DECADE_NAMES: dict[str, tuple[tuple[str, str], ...]] = {
    "Pre1900": (
        ("Gertrude", _F), ("Clarence", _M), ("Mildred", _F), ("Herbert", _M),
        ("Bertha", _F), ("Agnes", _F), ("Albert", _M), ("Florence", _F),
        ("Walter", _M), ("Edith", _F),
    ),
    "D1900s": (
        ("Ethel", _F), ("Harold", _M), ("Pearl", _F), ("Clarence", _M),
        ("Minnie", _F), ("Alice", _F), ("Raymond", _M), ("Ruth", _F),
        ("Frank", _M), ("Helen", _F),
    ),
    "D1910s": (
        ("Dorothy", _F), ("Earl", _M), ("Gladys", _F), ("Howard", _M),
        ("Thelma", _F),
    ),
    "D1920s": (
        ("Betty", _F), ("Donald", _M), ("Doris", _F), ("Raymond", _M),
        ("Shirley", _F),
    ),
    "D1930s": (
        ("Barbara", _F), ("Robert", _M), ("Patricia", _F), ("Richard", _M),
        ("Carol", _F),
    ),
    "D1940s": (
        ("Linda", _F), ("Gary", _M), ("Sandra", _F), ("Larry", _M),
        ("Sharon", _F),
    ),
    "D1950s": (
        ("Deborah", _F), ("Dennis", _M), ("Debra", _F), ("Timothy", _M),
        ("Pamela", _F),
    ),
    "D1960s": (
        ("Lisa", _F), ("Mark", _M), ("Kimberly", _F), ("Kevin", _M),
        ("Michelle", _F),
    ),
    "D1970s": (
        ("Jennifer", _F), ("Jason", _M), ("Amy", _F), ("Brian", _M),
        ("Heather", _F),
    ),
    "D1980s": (
        ("Jessica", _F), ("Michael", _M), ("Amanda", _F), ("Christopher", _M),
        ("Ashley", _F),
    ),
    "D1990s": (
        ("Brittany", _F), ("Tyler", _M), ("Taylor", _N), ("Brandon", _M),
        ("Megan", _F),
    ),
    "D2000s": (
        ("Madison", _F), ("Aiden", _M), ("Emma", _F), ("Ethan", _M),
        ("Chloe", _F),
    ),
    "D2010s": (
        ("Sophia", _F), ("Liam", _M), ("Olivia", _F), ("Noah", _M),
        ("Ava", _F),
    ),
    "D2020s": (
        ("Luna", _F), ("Ezra", _M), ("Charlotte", _F), ("Oliver", _M),
        ("Amelia", _F), ("Mia", _F), ("Liam", _M), ("Harper", _N),
        ("Mason", _M), ("Evelyn", _F),
    ),
}

# temporal_bias.rs:544-556 — decade-spanning names, nominal peak D1950s
_CLASSICS: tuple[tuple[str, str], ...] = (
    ("James", _M), ("Elizabeth", _F), ("William", _M), ("Mary", _F),
    ("John", _M), ("Sarah", _F), ("Robert", _M), ("Anna", _F),
    ("Michael", _M), ("Emily", _F),
)

# temporal_bias.rs:358-377 — the 10 sentence templates ({} = full name)
_TEMPLATES = (
    "{} was featured in the historical archives.",
    "The biography of {} was published last year.",
    "{} made significant contributions to the field.",
    "Records show that {} attended the event in 1950.",
    "{} was recognized for lifetime achievements.",
    "The family of {} established a scholarship fund.",
    "{} served as president of the organization.",
    "Historical documents mention {} in several contexts.",
    "{} was known for innovative research methods.",
    "The legacy of {} continues to inspire new generations.",
)


def temporal_sentence(full_name: str) -> str:
    """create_realistic_temporal_sentence (temporal_bias.rs:349-378)
    with the documented md5-for-DefaultHasher substitution."""
    h = int.from_bytes(hashlib.md5(full_name.encode()).digest()[:8], "little")
    return _TEMPLATES[h % len(_TEMPLATES)].format(full_name)


def create_temporal_name_dataset() -> list[tuple]:
    """create_temporal_name_dataset (temporal_bias.rs:388-594): 95
    (first_name, last_name, full_name, peak_decade, gender, is_classic)
    rows — last names cycle per list, classics appended under D1950s."""
    rows: list[tuple] = []
    for decade, names in _DECADE_NAMES.items():
        for i, (first, gender) in enumerate(names):
            last = _LAST_NAMES[i % len(_LAST_NAMES)]
            rows.append((first, last, f"{first} {last}", decade, gender, False))
    for i, (first, gender) in enumerate(_CLASSICS):
        last = _LAST_NAMES[i % len(_LAST_NAMES)]
        rows.append((first, last, f"{first} {last}", "D1950s", gender, True))
    return rows


_NAME_SCHEMA = (
    "url string, first_name string, last_name string, full_name string, "
    "peak_decade string, gender string, is_classic boolean, sentence string"
)


def names_df(spark: SparkSession, rows: list[tuple] | None = None) -> DataFrame:
    """The temporal name dataset keyed by synthetic url, sentence
    pre-generated (one row per TemporalNameExample)."""
    data = rows if rows is not None else create_temporal_name_dataset()
    keyed = [
        (f"temporal-bias://{i:03d}", *r, temporal_sentence(r[2]))
        for i, r in enumerate(data)
    ]
    return spark.createDataFrame(keyed, _NAME_SCHEMA)


def recognition_table(examples: DataFrame, mentions: DataFrame) -> DataFrame:
    """Per-name recognized flag (temporal_bias.rs:230-235): recognized
    when ANY extracted mention on the url is a PER whose surface text
    contains the first name. Left join + groupBy — one shuffle on url,
    no python."""
    m = mentions.select(
        F.col("url").alias("m_url"),
        F.col("entity_type").alias("m_type"),
        F.col("start").alias("m_start"),
        F.col("end").alias("m_end"),
    )
    joined = examples.join(m, examples["url"] == m["m_url"], "left")
    hit = (
        (F.col("m_type") == "PER")
        & F.expr(
            "contains(substring(sentence, m_start + 1, m_end - m_start),"
            " first_name)"
        )
    ).cast("int")
    return joined.groupBy(
        "url", "first_name", "full_name", "peak_decade", "gender",
        "is_classic",
    ).agg(F.coalesce(F.max(hit), F.lit(0)).alias("recognized"))


def group_rates(recognition: DataFrame) -> DataFrame:
    """The by_decade / by_gender maps (temporal_bias.rs:240-264,
    296-310) as one unioned (dimension, bucket, rate, n) table."""

    def dim(col: str, name: str) -> DataFrame:
        return recognition.groupBy(F.col(col).alias("bucket")).agg(
            F.lit(name).alias("dimension"),
            (F.sum("recognized") / F.count("*")).alias("rate"),
            F.count("*").alias("n"),
        )

    return (
        dim("peak_decade", "decade")
        .unionByName(dim("gender", "gender"))
        .select("dimension", "bucket", "rate", "n")
    )


def _rate(flag) -> F.Column:
    """count_to_rate (temporal_bias.rs:296-302): 0.0 on empty group."""
    return F.coalesce(
        F.sum(F.when(flag, F.col("recognized"))) / F.sum(F.when(flag, 1)),
        F.lit(0.0),
    )


def temporal_bias_report(recognition: DataFrame) -> DataFrame:
    """ONE-row TemporalBiasResults (temporal_bias.rs:167-190, 305-330):
    overall_recognition_rate, historical/modern rates + |gap|,
    temporal_parity_gap (max − min decade rate, 0.0 with <2 decades),
    classic/trendy rates, total_tested."""
    hist = F.col("peak_decade").isin(
        [d for d in DECADES if is_historical(d)]
    )
    mod = F.col("peak_decade").isin([d for d in DECADES if is_modern(d)])

    overall = recognition.agg(
        F.coalesce(F.sum("recognized") / F.count("*"), F.lit(0.0)).alias(
            "overall_recognition_rate"
        ),
        _rate(hist).alias("historical_rate"),
        _rate(mod).alias("modern_rate"),
        _rate(F.col("is_classic")).alias("classic_rate"),
        _rate(~F.col("is_classic")).alias("trendy_rate"),
        F.count("*").alias("total_tested"),
    ).withColumn(
        "historical_modern_gap",
        F.abs(F.col("historical_rate") - F.col("modern_rate")),
    )

    parity = (
        recognition.groupBy("peak_decade")
        .agg((F.sum("recognized") / F.count("*")).alias("rate"))
        .agg(
            F.when(F.count("*") < 2, F.lit(0.0))
            .otherwise(F.max("rate") - F.min("rate"))
            .alias("temporal_parity_gap")
        )
    )

    return overall.crossJoin(parity).select(
        "overall_recognition_rate", "historical_rate", "modern_rate",
        "historical_modern_gap", "temporal_parity_gap", "classic_rate",
        "trendy_rate", "total_tested",
    )


def evaluate_temporal_bias(
    spark: SparkSession, examples: DataFrame | None = None
) -> DataFrame:
    """End-to-end: run the real extraction stack over the name
    sentences (TemporalBiasEvaluator::evaluate,
    temporal_bias.rs:215-330) and return the one-row report."""
    from anno_spark.operators.extract import extract_documents, mentions_table

    ex = examples if examples is not None else names_df(spark)
    mentions = mentions_table(
        extract_documents(ex.select("url", F.col("sentence").alias("text")))
    )
    return temporal_bias_report(recognition_table(ex, mentions))

"""Entity length-bias evaluation (reference:
anno/src/eval/length_bias.rs:37-341).

Measures NER recognition rate by entity length — models biased toward
training-data length statistics degrade on very short (``"3M"``) or
very long (``"United States Department of Health and Human
Services"``) entities (length_bias.rs:1-17, citing Jeong & Kang 2021).

Distributed shape: bucket classification is pure ``F.when`` codegen
over char length / word count (length_bias.rs:54-73, 92-99);
recognition runs the REAL extraction stack once over the example
sentences (the reference calls ``model.extract_entities`` per example,
length_bias.rs:215-230) and joins mentions back relationally; every
rollup is a map-side-combinable aggregation, so the evaluation is one
extraction pass + small aggregations at any corpus size.

Reference quirks preserved:

* recognition = ANY mention with the expected type whose span slice of
  the sentence CONTAINS the entity text (length_bias.rs:224-230 —
  containment, not equality);
* ``short_vs_long_gap`` sums the SingleWord and TwoWords rates and
  divides by 2.0 even when only one of them is present
  (length_bias.rs:283-291), and falls back to the short rate when no
  FourPlusWords bucket exists (:292-295);
* parity gaps are max−min over present buckets, 0.0 when fewer than
  two buckets (compute_max_gap, length_bias.rs:330-341).

Entity types are engine-space labels (PER/ORG/LOC/DATE/MONEY); the
reference's ``EntityType::Person`` etc. map 1:1 via the TypeMapper port
(operators/schema_map.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# length_bias.rs:54-62
CHAR_BUCKETS = ("VeryShort", "Short", "Medium", "Long", "VeryLong")
# length_bias.rs:92-99
WORD_BUCKETS = ("SingleWord", "TwoWords", "ThreeWords", "FourPlusWords")


def char_bucket(length_col) -> F.Column:
    """LengthBucket::from_char_length (length_bias.rs:54-62)."""
    c = F.col(length_col) if isinstance(length_col, str) else length_col
    return (
        F.when(c <= 5, F.lit("VeryShort"))
        .when(c <= 15, F.lit("Short"))
        .when(c <= 30, F.lit("Medium"))
        .when(c <= 50, F.lit("Long"))
        .otherwise(F.lit("VeryLong"))
    )


def word_bucket(count_col) -> F.Column:
    """WordCountBucket::from_count (length_bias.rs:92-99)."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    return (
        F.when(c <= 1, F.lit("SingleWord"))
        .when(c == 2, F.lit("TwoWords"))
        .when(c == 3, F.lit("ThreeWords"))
        .otherwise(F.lit("FourPlusWords"))
    )


# create_length_varied_dataset (length_bias.rs:348-645), engine-space
# types. Reference DATA is the spec: entity list transcribed verbatim.
LENGTH_VARIED_EXAMPLES: tuple[tuple[str, str, str], ...] = (
    ("JFK", "JFK gave a famous speech in Berlin.", "PER"),
    ("FDR", "FDR led the country through World War II.", "PER"),
    ("John Smith", "John Smith attended the meeting.", "PER"),
    ("Mary Johnson", "Mary Johnson won the award.", "PER"),
    ("Dr. Martin Luther King",
     "Dr. Martin Luther King delivered a powerful speech.", "PER"),
    ("William Jefferson Clinton",
     "William Jefferson Clinton served as president.", "PER"),
    ("His Royal Highness Prince William",
     "His Royal Highness Prince William visited the hospital.", "PER"),
    ("IBM", "IBM announced new products.", "ORG"),
    ("MIT", "MIT published research findings.", "ORG"),
    ("NASA", "NASA launched a new satellite.", "ORG"),
    ("Google Inc", "Google Inc acquired the startup.", "ORG"),
    ("Apple Computer", "Apple Computer revolutionized mobile phones.", "ORG"),
    ("University of California",
     "University of California released the study.", "ORG"),
    ("World Health Organization",
     "World Health Organization issued guidelines.", "ORG"),
    ("Massachusetts Institute of Technology",
     "Massachusetts Institute of Technology won the competition.", "ORG"),
    ("International Business Machines Corporation",
     "International Business Machines Corporation reported earnings.", "ORG"),
    ("United States Department of Health and Human Services",
     "United States Department of Health and Human Services announced the policy.",
     "ORG"),
    ("European Organization for Nuclear Research",
     "European Organization for Nuclear Research discovered the particle.", "ORG"),
    ("NYC", "NYC is known for its skyline.", "LOC"),
    ("LA", "LA has beautiful weather.", "LOC"),
    ("New York", "New York is a bustling city.", "LOC"),
    ("London", "London has many museums.", "LOC"),
    ("San Francisco Bay Area", "San Francisco Bay Area is a tech hub.", "LOC"),
    ("United Arab Emirates", "United Arab Emirates hosted the conference.", "LOC"),
    ("Democratic Republic of the Congo",
     "Democratic Republic of the Congo has vast resources.", "LOC"),
    ("Saint Vincent and the Grenadines",
     "Saint Vincent and the Grenadines is in the Caribbean.", "LOC"),
    ("Llanfairpwllgwyngyllgogerychwyrndrobwllllantysiliogogogoch",
     "Llanfairpwllgwyngyllgogerychwyrndrobwllllantysiliogogogoch is a town in Wales.",
     "LOC"),
    ("Dr. Jane Smith", "Dr. Jane Smith diagnosed the patient.", "PER"),
    ("Prof. John Doe", "Prof. John Doe published the research.", "PER"),
    ("Mary-Jane Watson", "Mary-Jane Watson attended the event.", "PER"),
    ("José María García", "José María García spoke at the conference.", "PER"),
    ("Robert Williams Jr.", "Robert Williams Jr. inherited the business.", "PER"),
    ("Elizabeth Taylor III",
     "Elizabeth Taylor III was the third generation.", "PER"),
    ("Jean-Pierre Dubois", "Jean-Pierre Dubois visited from France.", "PER"),
    ("Mary Ann Johnson", "Mary Ann Johnson was the keynote speaker.", "PER"),
    ("AT&T", "AT&T announced the merger.", "ORG"),
    ("3M", "3M developed new materials.", "ORG"),
    ("JPMorgan Chase", "JPMorgan Chase reported earnings.", "ORG"),
    ("Bank of America", "Bank of America opened new branches.", "ORG"),
    ("General Electric Company",
     "General Electric Company restructured operations.", "ORG"),
    ("The Coca-Cola Company",
     "The Coca-Cola Company launched a new product.", "ORG"),
    ("Procter & Gamble", "Procter & Gamble acquired the brand.", "ORG"),
    ("Johnson & Johnson", "Johnson & Johnson developed the vaccine.", "ORG"),
    ("UK", "UK announced new policies.", "LOC"),
    ("USA", "USA hosted the summit.", "LOC"),
    ("Los Angeles", "Los Angeles hosted the Olympics.", "LOC"),
    ("San Diego", "San Diego is a coastal city.", "LOC"),
    ("New York City", "New York City never sleeps.", "LOC"),
    ("Greater London Area",
     "Greater London Area has millions of residents.", "LOC"),
    ("Republic of South Africa",
     "Republic of South Africa celebrated independence.", "LOC"),
    ("Federative Republic of Brazil",
     "Federative Republic of Brazil hosted the World Cup.", "LOC"),
    ("2024", "The year 2024 was significant.", "DATE"),
    ("January 15, 2024",
     "The meeting was scheduled for January 15, 2024.", "DATE"),
    ("Q1 2024", "Q1 2024 showed strong growth.", "DATE"),
    ("$5", "The item cost $5.", "MONEY"),
    ("$1,234.56", "The total was $1,234.56.", "MONEY"),
    ("€1,000,000", "The investment was €1,000,000.", "MONEY"),
)


def length_varied_dataset(spark) -> DataFrame:
    """The reference's length-varied diagnostic set as a DataFrame
    (create_length_varied_dataset, length_bias.rs:348-645): (url,
    entity_text, sentence, entity_type) with derived char_length /
    word_count / buckets (LengthTestExample::with_sentence,
    length_bias.rs:142-156)."""
    rows = [
        (f"length-bias://{i:03d}", e, s, t)
        for i, (e, s, t) in enumerate(LENGTH_VARIED_EXAMPLES)
    ]
    df = spark.createDataFrame(
        rows, "url string, entity_text string, sentence string, entity_type string"
    )
    return annotate_lengths(df)


def annotate_lengths(examples: DataFrame) -> DataFrame:
    """Attach char_length / word_count / char_bucket / word_bucket
    (LengthTestExample construction, length_bias.rs:126-156).
    ``F.length`` counts codepoints — the same unit as Rust
    ``chars().count()``; word count is split_whitespace semantics."""
    return examples.withColumns(
        {
            "char_length": F.length("entity_text"),
            "word_count": F.size(F.split(F.trim(F.col("entity_text")), r"\s+")),
        }
    ).withColumns(
        {
            "char_bucket": char_bucket("char_length"),
            "word_bucket": word_bucket("word_count"),
        }
    )


def recognition_table(examples: DataFrame, mentions: DataFrame) -> DataFrame:
    """Per-example recognized flag (length_bias.rs:215-230): an example
    is recognized when ANY extracted mention on its url has the expected
    entity type and its span slice of the sentence contains the entity
    text. Left join + groupBy — one shuffle on url, no python."""
    m = mentions.select(
        F.col("url").alias("m_url"),
        F.col("entity_type").alias("m_type"),
        F.col("start").alias("m_start"),
        F.col("end").alias("m_end"),
    )
    joined = examples.join(m, examples["url"] == m["m_url"], "left")
    hit = (
        (F.col("m_type") == F.col("entity_type"))
        & F.expr(
            "contains(substring(sentence, m_start + 1, m_end - m_start), entity_text)"
        )
    ).cast("int")
    agg = joined.groupBy(
        "url", "entity_text", "entity_type", "char_length",
        "word_count", "char_bucket", "word_bucket",
    ).agg(F.coalesce(F.max(hit), F.lit(0)).alias("recognized"))
    return agg


def bucket_rates(recognition: DataFrame) -> DataFrame:
    """Recognition rate per (dimension, bucket) — the by_char_bucket /
    by_word_bucket / by_entity_type maps (length_bias.rs:240-270) as
    one unioned breakdown table."""
    def dim(col: str, name: str) -> DataFrame:
        return recognition.groupBy(F.col(col).alias("bucket")).agg(
            F.lit(name).alias("dimension"),
            (F.sum("recognized") / F.count("*")).alias("rate"),
            F.count("*").alias("n"),
        )

    return (
        dim("char_bucket", "char")
        .unionByName(dim("word_bucket", "word"))
        .unionByName(dim("entity_type", "type"))
        .select("dimension", "bucket", "rate", "n")
    )


def length_bias_report(recognition: DataFrame) -> DataFrame:
    """ONE-row LengthBiasResults (length_bias.rs:163-187, 272-325):
    overall_recognition_rate, char/word parity gaps (max−min, 0 when a
    dimension has <2 buckets), short_vs_long_gap (the reference's
    half-sum + fallback quirks), avg recognized/missed char length
    (0.0 when empty, :297-310), total_tested."""
    rates = bucket_rates(recognition).cache()

    def gap(name: str):
        return (
            rates.where(F.col("dimension") == name)
            .agg(
                F.when(
                    F.count("*") < 2, F.lit(0.0)
                ).otherwise(F.max("rate") - F.min("rate")).alias("g")
            )
        )

    char_gap = gap("char").select(F.col("g").alias("char_length_parity_gap"))
    word_gap = gap("word").select(F.col("g").alias("word_count_parity_gap"))

    # length_bias.rs:283-295 — short = (ΣSingleWord,TwoWords)/2.0 over
    # PRESENT buckets; long falls back to short when FourPlusWords absent
    svl = rates.where(F.col("dimension") == "word").agg(
        (
            F.sum(
                F.when(
                    F.col("bucket").isin("SingleWord", "TwoWords"), F.col("rate")
                ).otherwise(F.lit(0.0))
            )
            / 2.0
        ).alias("short_rate"),
        F.max(
            F.when(F.col("bucket") == "FourPlusWords", F.col("rate"))
        ).alias("long_rate_raw"),
    ).select(
        F.abs(
            F.col("short_rate")
            - F.coalesce(F.col("long_rate_raw"), F.col("short_rate"))
        ).alias("short_vs_long_gap")
    )

    overall = recognition.agg(
        (F.sum("recognized") / F.count("*")).alias("overall_recognition_rate"),
        F.coalesce(
            F.avg(F.when(F.col("recognized") == 1, F.col("char_length"))),
            F.lit(0.0),
        ).alias("avg_recognized_char_length"),
        F.coalesce(
            F.avg(F.when(F.col("recognized") == 0, F.col("char_length"))),
            F.lit(0.0),
        ).alias("avg_missed_char_length"),
        F.count("*").alias("total_tested"),
    )
    return overall.crossJoin(char_gap).crossJoin(word_gap).crossJoin(svl)


def evaluate_length_bias(spark, examples: DataFrame | None = None) -> DataFrame:
    """End-to-end: run the real extraction stack over the example
    sentences (EntityLengthEvaluator::evaluate, length_bias.rs:204-325)
    and return the one-row report."""
    from anno_spark.operators.extract import extract_documents, mentions_table

    ex = examples if examples is not None else length_varied_dataset(spark)
    mentions = mentions_table(
        extract_documents(ex.select("url", F.col("sentence").alias("text")))
    )
    return length_bias_report(recognition_table(ex, mentions))

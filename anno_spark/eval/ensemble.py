"""Ensemble disagreement metrics for multi-model NER (reference:
anno/src/eval/ensemble.rs:1-591).

Where do N extraction models agree? Per-entity agreement with majority
votes, per-example agreement rates, per-type agreement, a pairwise
model-agreement matrix, and (simplified) Fleiss' kappa
(EnsembleAnalyzer::analyze_single / analyze_batch,
ensemble.rs:117-340; compute_fleiss_kappa, :345-415).

Data model: one predictions table (example_id, model_name, pred_idx,
text, entity_type) — pred_idx is the position in the model's entity
list, needed because the reference resolves duplicate surface texts by
FIRST occurrence (``find``, ensemble.rs:141-146). A ``roster``
(example_id, model_name) names the models that RAN on each example —
a model that ran but predicted nothing counts as an implicit None vote
and forces disagreement (ensemble.rs:160-163). Default roster:
distinct examples × distinct model names (every model ran everywhere,
the reference's typical shape).

Distributed shape: every metric is a join/groupBy chain keyed on
example_id — no per-example python. 10^9 examples × M models stream
through the same plan; only the final one-row/typed rollups are small.

Quirks preserved:

* entity identity is the LOWERCASED text for agreement and kappa
  (ensemble.rs:131-135) but the RAW (text, type) pair for the pairwise
  Jaccard matrix (ensemble.rs:267-276);
* a disagreement's majority type lands in ``type_total`` with NO
  agreement credit, so a type that only ever appears via majority
  votes has agreement rate 0 (ensemble.rs:247-252);
* zero entities ⇒ agreement_rate 1.0, empty batch ⇒ kappa 1.0,
  |1 − p_e| < 1e-10 ⇒ kappa 1.0 (ensemble.rs:119-126, 289-293, 410-414);
* per-subject kappa agreement divides by n(n−1) where n is the
  example's rater count — a 1-model example follows IEEE (inf/NaN)
  exactly as the reference's f64 does;
* the reference's majority-vote tie and iteration orders are
  HashMap-unspecified; the port fixes them deterministically (higher
  count, then lexicographically smaller type) — documented deviation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PREDICTION_SCHEMA = (
    "example_id string, model_name string, pred_idx int, text string,"
    " entity_type string"
)


def predictions_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Flattened ModelPrediction rows (ensemble.rs:44-51)."""
    return spark.createDataFrame(rows, PREDICTION_SCHEMA)


def default_roster(preds: DataFrame) -> DataFrame:
    """Every distinct model crossed with every distinct example."""
    return (
        preds.select("example_id")
        .distinct()
        .crossJoin(F.broadcast(preds.select("model_name").distinct()))
    )


def _votes(preds: DataFrame, roster: DataFrame) -> DataFrame:
    """One row per (example, lowercased entity text, roster model):
    the model's FIRST-occurrence type or NULL (ensemble.rs:137-148)."""
    firsts = (
        preds.withColumn("etext", F.lower("text"))
        .groupBy("example_id", "model_name", "etext")
        .agg(F.min_by("entity_type", "pred_idx").alias("etype"))
    )
    universe = firsts.select("example_id", "etext").distinct()
    return (
        universe.join(roster, "example_id")
        .join(firsts, ["example_id", "model_name", "etext"], "left")
    )


def entity_agreement(preds: DataFrame, roster: DataFrame | None = None) -> DataFrame:
    """Per-entity verdict (analyze_single's loop, ensemble.rs:137-188):
    example_id, etext, n_models, n_pred, agreed, agreed_type,
    majority_type, majority_confidence. Entities nobody typed are
    dropped (the reference's ``continue``)."""
    roster = roster if roster is not None else default_roster(preds)
    votes = _votes(preds, roster)

    counts = votes.groupBy("example_id", "etext").agg(
        F.count("*").alias("n_models"),
        F.count("etype").alias("n_pred"),
        F.countDistinct("etype").alias("n_types"),
        F.min("etype").alias("_any_type"),
    )

    type_counts = (
        votes.where(F.col("etype").isNotNull())
        .groupBy("example_id", "etext", "etype")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("example_id", "etext").orderBy(
        F.desc("cnt"), F.asc("etype")
    )
    majority = (
        type_counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "example_id", "etext",
            F.col("etype").alias("majority_type"),
            F.col("cnt").alias("_maj_cnt"),
        )
    )

    agreed = (F.col("n_types") == 1) & (F.col("n_pred") == F.col("n_models"))
    return (
        counts.where(F.col("n_pred") > 0)
        .join(majority, ["example_id", "etext"])
        .select(
            "example_id", "etext", "n_models", "n_pred",
            agreed.alias("agreed"),
            F.when(agreed, F.col("_any_type")).alias("agreed_type"),
            F.when(~agreed, F.col("majority_type")).alias("majority_type"),
            F.when(~agreed, F.col("_maj_cnt") / F.col("n_models")).alias(
                "majority_confidence"
            ),
        )
    )


def single_example_analysis(
    preds: DataFrame, roster: DataFrame | None = None
) -> DataFrame:
    """Per-example SingleExampleAnalysis scalars
    (ensemble.rs:117-202): example_id, agreement_rate (1.0 with zero
    entities), n_agreed, n_disagreed, num_models."""
    roster = roster if roster is not None else default_roster(preds)
    ent = entity_agreement(preds, roster)
    per_model = roster.groupBy("example_id").agg(
        F.count("*").alias("num_models")
    )
    agg = ent.groupBy("example_id").agg(
        F.sum(F.col("agreed").cast("int")).alias("n_agreed"),
        F.sum((~F.col("agreed")).cast("int")).alias("n_disagreed"),
    )
    return (
        per_model.join(agg, "example_id", "left")
        .select(
            "example_id",
            F.coalesce(
                F.col("n_agreed")
                / (F.col("n_agreed") + F.col("n_disagreed")),
                F.lit(1.0),
            ).alias("agreement_rate"),
            F.coalesce("n_agreed", F.lit(0)).alias("n_agreed"),
            F.coalesce("n_disagreed", F.lit(0)).alias("n_disagreed"),
            "num_models",
        )
    )


def agreement_by_type(
    preds: DataFrame, roster: DataFrame | None = None
) -> DataFrame:
    """Per-type agreement (ensemble.rs:240-252, 296-313): agreed
    entities credit their common type; disagreements add their
    majority type to the denominator only. disagreement_rate = 1 −
    rate, descending (ties: type ascending — reference order is
    HashMap-unspecified)."""
    ent = entity_agreement(preds, roster)
    typed = ent.select(
        F.coalesce("agreed_type", "majority_type").alias("entity_type"),
        F.col("agreed").cast("int").alias("a"),
    )
    return (
        typed.groupBy("entity_type")
        .agg((F.sum("a") / F.count("*")).alias("rate"), F.count("*").alias("n"))
        .withColumn("disagreement_rate", 1.0 - F.col("rate"))
        .orderBy(F.desc("disagreement_rate"), F.asc("entity_type"))
    )


def pairwise_agreement(
    preds: DataFrame, roster: DataFrame | None = None
) -> DataFrame:
    """Model-pair Jaccard over RAW (text, type) sets, summed across
    examples (ensemble.rs:255-281, 316-337): model_a < model_b,
    agreement = Σ|A∩B| / Σ|A∪B| (1.0 when the union is empty)."""
    roster = roster if roster is not None else default_roster(preds)
    sets = preds.select("example_id", "model_name", "text", "entity_type").distinct()

    sizes = sets.groupBy("example_id", "model_name").agg(
        F.count("*").alias("sz")
    )
    models = roster.select("model_name").distinct()
    pairs = (
        models.alias("a")
        .crossJoin(models.alias("b"))
        .where(F.col("a.model_name") < F.col("b.model_name"))
        .select(
            F.col("a.model_name").alias("model_a"),
            F.col("b.model_name").alias("model_b"),
        )
    )

    inter = (
        sets.alias("x")
        .join(
            sets.alias("y"),
            ["example_id", "text", "entity_type"],
        )
        .where(F.col("x.model_name") < F.col("y.model_name"))
        .groupBy(
            F.col("x.model_name").alias("model_a"),
            F.col("y.model_name").alias("model_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )

    # Σ|A∪B| over examples where BOTH models are rostered = Σ|A|+Σ|B|−Σ|A∩B|
    per_pair_sizes = (
        roster.alias("ra")
        .join(
            roster.alias("rb"),
            F.col("ra.example_id") == F.col("rb.example_id"),
        )
        .where(F.col("ra.model_name") < F.col("rb.model_name"))
        .select(
            F.col("ra.example_id").alias("example_id"),
            F.col("ra.model_name").alias("model_a"),
            F.col("rb.model_name").alias("model_b"),
        )
        .join(
            sizes.withColumnsRenamed({"model_name": "model_a", "sz": "sz_a"}),
            ["example_id", "model_a"],
            "left",
        )
        .join(
            sizes.withColumnsRenamed({"model_name": "model_b", "sz": "sz_b"}),
            ["example_id", "model_b"],
            "left",
        )
        .groupBy("model_a", "model_b")
        .agg(
            (F.coalesce(F.sum("sz_a"), F.lit(0))
             + F.coalesce(F.sum("sz_b"), F.lit(0))).alias("n_sum")
        )
    )

    return (
        pairs.join(per_pair_sizes, ["model_a", "model_b"], "left")
        .join(inter, ["model_a", "model_b"], "left")
        .select(
            "model_a", "model_b",
            F.coalesce(
                (F.coalesce("n_inter", F.lit(0)))
                / (F.col("n_sum") - F.coalesce("n_inter", F.lit(0))),
                F.lit(1.0),
            ).alias("agreement"),
        )
    )


def fleiss_kappa(preds: DataFrame, roster: DataFrame | None = None):
    """Simplified Fleiss' kappa column pieces
    (compute_fleiss_kappa, ensemble.rs:345-415) as a one-row frame:
    fleiss_kappa, n_subjects, total_ratings."""
    roster = roster if roster is not None else default_roster(preds)
    votes = _votes(preds, roster)
    raters = roster.groupBy("example_id").agg(F.count("*").alias("n_raters"))

    cat = (
        votes.where(F.col("etype").isNotNull())
        .groupBy("example_id", "etext", "etype")
        .agg(F.count("*").alias("cnt"))
    )
    # per-subject p_i = (Σ n_c² − n) / (n (n − 1)); n = example rater count
    subj = (
        cat.groupBy("example_id", "etext")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"))
        .join(F.broadcast(raters), "example_id")
        .select(
            (
                (F.col("sum_sq") - F.col("n_raters"))
                / (F.col("n_raters") * (F.col("n_raters") - F.lit(1.0)))
            ).alias("p_i")
        )
    )
    p_bar = subj.agg(
        F.avg("p_i").alias("p_bar"), F.count("*").alias("n_subjects")
    )

    totals = cat.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("total_ratings")
    )
    p_e = (
        cat.groupBy("etype")
        .agg(F.sum("cnt").alias("tc"))
        .crossJoin(F.broadcast(totals))
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("tc") / F.col("total_ratings"))
                    * (F.col("tc") / F.col("total_ratings"))
                ),
                F.lit(0.0),
            ).alias("p_e"),
            F.max("total_ratings").alias("total_ratings"),
        )
    )

    kappa = F.when(
        (F.col("n_subjects") == 0)
        | F.col("total_ratings").isNull()
        | (F.col("total_ratings") == 0)
        | (F.abs(1.0 - F.col("p_e")) < 1e-10),
        F.lit(1.0),
    ).otherwise((F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")))

    return (
        p_bar.crossJoin(p_e.select("p_e", "total_ratings"))
        .select(
            kappa.alias("fleiss_kappa"),
            "n_subjects",
            F.coalesce("total_ratings", F.lit(0)).alias("total_ratings"),
        )
    )


def ensemble_report(preds: DataFrame, roster: DataFrame | None = None) -> DataFrame:
    """ONE-row EnsembleAnalysisResults scalars (ensemble.rs:205-340):
    overall_agreement_rate, fleiss_kappa, total_examples,
    total_entities. The typed/pairwise breakdowns are their own
    tables (agreement_by_type / pairwise_agreement)."""
    roster = roster if roster is not None else default_roster(preds)
    ent = entity_agreement(preds, roster)
    overall = ent.agg(
        F.coalesce(
            F.sum(F.col("agreed").cast("int")) / F.count("*"), F.lit(1.0)
        ).alias("overall_agreement_rate"),
        F.count("*").alias("total_entities"),
    )
    examples = roster.select("example_id").distinct().agg(
        F.count("*").alias("total_examples")
    )
    return (
        overall.crossJoin(fleiss_kappa(preds, roster).select("fleiss_kappa"))
        .crossJoin(examples)
        .select(
            "overall_agreement_rate", "fleiss_kappa",
            "total_examples", "total_entities",
        )
    )


def agreement_grade(rate: float) -> str:
    """agreement_grade (ensemble.rs:423-435)."""
    if rate >= 0.95:
        return "Excellent agreement"
    if rate >= 0.85:
        return "Good agreement"
    if rate >= 0.70:
        return "Moderate agreement"
    if rate >= 0.50:
        return "Fair agreement"
    return "Poor agreement"


def kappa_interpretation(kappa: float) -> str:
    """kappa_interpretation (ensemble.rs:438-452)."""
    if kappa < 0.0:
        return "Less than chance agreement"
    if kappa < 0.20:
        return "Slight agreement"
    if kappa < 0.40:
        return "Fair agreement"
    if kappa < 0.60:
        return "Moderate agreement"
    if kappa < 0.80:
        return "Substantial agreement"
    return "Almost perfect agreement"

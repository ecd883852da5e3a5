"""Synthetic NER gold corpus: 29 domains, 170 annotated examples.

Behavioral port of the reference's synthetic evaluation corpus
(reference: anno/src/eval/synthetic.rs:1-216 and
anno/src/eval/dataset/synthetic/*.rs, transcribed to
``synthetic_data.py`` by scripts/extract_synthetic_datasets.py).  The
reference positions this corpus for unit testing / pattern coverage /
edge cases, NOT model comparison (synthetic.rs:18-29) — same stance
here.

Offsets: the reference authors character offsets in this data (its CJK
and accented examples index by chars, verified at transcription — zero
text/offset mismatches across all 416 annotations), which matches the
engine's char-offset convention directly (SURVEY T4).

The distributed surface turns the corpus into a DataFrame and scores
any extraction backend against it with the SemEval four-mode evaluator
(:mod:`anno_spark.eval.modes`) — the per-example work rides the same
``mapInPandas`` contract as production extraction.
"""

from __future__ import annotations

from anno_spark.eval.synthetic_data import DATASETS

__all__ = [
    "DOMAINS",
    "DIFFICULTIES",
    "all_datasets",
    "dataset",
    "conll_style_dataset",
    "extended_quality_dataset",
    "datasets_by_domain",
    "datasets_by_difficulty",
    "dataset_stats",
    "examples_df",
    "evaluate_backend_df",
]

DIFFICULTIES = ("Easy", "Medium", "Hard", "Adversarial")

# aggregation order transcribed from mod.rs::all_datasets (synthetic/
# mod.rs:77-119): core domains, misc, specialized, industry
_ALL_ORDER = (
    "news", "social_media", "biomedical", "financial", "legal",
    "scientific", "entertainment",
    "adversarial", "structured", "conversational", "historical",
    "sports", "politics", "ecommerce", "travel", "weather", "academic",
    "food", "real_estate", "cybersecurity", "multilingual",
    "globally_diverse", "hard_domain_examples",
    "technology", "healthcare", "manufacturing", "automotive", "energy",
    "aerospace",
)

DOMAINS = tuple(sorted({ex[2] for exs in DATASETS.values() for ex in exs}))


def dataset(name: str) -> list:
    """One named dataset as (text, entities, domain, difficulty) rows."""
    return list(DATASETS[name])


def all_datasets() -> list:
    """Every example, in the reference's aggregation order."""
    out = []
    for key in _ALL_ORDER:
        out.extend(DATASETS[key])
    return out


def conll_style_dataset() -> list:
    """Alias for the news dataset (synthetic.rs:95-97)."""
    return dataset("news")


def extended_quality_dataset() -> list:
    """hard_domain + globally_diverse + adversarial (synthetic.rs:159-167)."""
    return (dataset("hard_domain_examples") + dataset("globally_diverse")
            + dataset("adversarial"))


def datasets_by_domain(domain: str) -> list:
    return [ex for ex in all_datasets() if ex[2] == domain]


def datasets_by_difficulty(difficulty: str) -> list:
    return [ex for ex in all_datasets() if ex[3] == difficulty]


def dataset_stats() -> dict:
    """total examples/entities + per-domain/difficulty counts
    (synthetic/mod.rs:137-160)."""
    examples = all_datasets()
    domains: dict = {}
    difficulties: dict = {}
    for _, ents, dom, diff in examples:
        domains[dom] = domains.get(dom, 0) + 1
        difficulties[diff] = difficulties.get(diff, 0) + 1
    return {
        "total_examples": len(examples),
        "total_entities": sum(len(e[1]) for e in examples),
        "domains": domains,
        "difficulties": difficulties,
    }


# ---------------------------------------------------------------------------
# distributed surface


def examples_df(spark, examples: list | None = None):
    """Corpus as (example_id, text, domain, difficulty) plus an exploded
    gold table (example_id, text, entity_type, start, end)."""
    from pyspark.sql import functions as F

    examples = examples if examples is not None else all_datasets()
    rows = [(i, text, dom, diff,
             [(et, ety, s, s + len(et)) for (et, ety, s) in ents])
            for i, (text, ents, dom, diff) in enumerate(examples)]
    df = spark.createDataFrame(
        rows,
        "example_id long, text string, domain string, difficulty string, "
        "gold array<struct<text string, entity_type string, "
        "start long, end long>>")
    corpus = df.select("example_id", "text", "domain", "difficulty")
    gold = df.select(
        "example_id", F.explode("gold").alias("g")
    ).select("example_id", "g.text", "g.entity_type", "g.start", "g.end")
    return corpus, gold


def evaluate_backend_df(spark, extract_fn, examples: list | None = None,
                        config=None):
    """Score an extraction backend over the corpus with all four SemEval
    modes; returns the 4-row corpus-level PRF DataFrame.

    ``extract_fn(text) -> list[Mention]`` runs per example inside
    ``mapInPandas`` (one Arrow batch per partition — the production
    extraction contract), so any of the engine's backends (regex,
    heuristic, stacked, ML seam) slots in unchanged.
    """
    import pandas as pd

    from anno_spark.eval import modes as M

    corpus, gold = examples_df(spark, examples)

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for m in extract_fn(row["text"]):
                    out.append((row["example_id"], m.entity_type,
                                m.start, m.end))
            yield pd.DataFrame(
                out, columns=["example_id", "entity_type", "start", "end"])

    pred = corpus.mapInPandas(
        run, schema="example_id long, entity_type string, start long, end long")
    return M.multi_mode_df(pred, gold, doc_col="example_id", config=config)

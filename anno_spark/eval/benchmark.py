"""Edge-case benchmark: adversarial template corpus + per-family scores.

Behavioral port of the reference benchmark generator (reference:
anno/src/eval/benchmark.rs:28-815): ten edge-case families — ambiguous
surfaces, Unicode/RTL, dense/sparse, nested, casing, boundary,
multi-word, numeric, jargon — cycled from transcribed templates
(``benchmark_data.py``), with the reference's sizing semantics.

Sizing quirks preserved (benchmark.rs:57-100):

* A single family yields ``max(count, len(templates))`` examples —
  asking for fewer than the template count still returns them all.
* ``All`` takes ``count // 10`` per family (so each family still
  floors at its template count), then pads by cycling from the front.

The distributed run scores a backend per family in one pass
(:func:`edge_case_scores`), reusing the harness's per-case machinery.
"""

from __future__ import annotations

from anno_spark.eval.benchmark_data import TEMPLATES

__all__ = ["EDGE_CASE_TYPES", "generate_large_dataset",
           "benchmark_stats", "edge_case_scores"]

EDGE_CASE_TYPES = tuple(sorted(TEMPLATES)) + ("all",)


def _family(family: str, count: int) -> list:
    """Cycle templates to max(count, len) (generate_from_templates,
    benchmark.rs:760-783); rows tagged (text, ents, domain, difficulty,
    family)."""
    templates, domain, difficulty = TEMPLATES[family]
    n = max(count, len(templates))
    out = []
    for i in range(n):
        text, ents = templates[i % len(templates)]
        out.append((text, list(ents), domain, difficulty, family))
    return out


def generate_large_dataset(min_count: int,
                           edge_case_type: str = "all") -> list:
    """At least ``min_count`` examples of the requested family
    (benchmark.rs:57-100)."""
    if edge_case_type == "all":
        per_type = min_count // 10
        examples = []
        for family in sorted(TEMPLATES):
            examples.extend(_family(family, per_type))
    elif edge_case_type in TEMPLATES:
        examples = _family(edge_case_type, min_count)
    else:
        raise ValueError(f"unknown edge case type: {edge_case_type}")
    # duplicate-pad from the front (benchmark.rs:89-97)
    i = 0
    while len(examples) < min_count and examples:
        examples.append(examples[i % len(examples)])
        i += 1
    return examples


def benchmark_stats(examples: list) -> dict:
    """BenchmarkStats::from_dataset (benchmark.rs:800-815)."""
    total = len(examples)
    total_entities = sum(len(e[1]) for e in examples)
    no_entities = sum(1 for e in examples if not e[1])
    return {
        "total_examples": total,
        "total_entities": total_entities,
        "avg_entities_per_example": total_entities / max(total, 1),
        "examples_with_no_entities": no_entities,
    }


def edge_case_scores(spark, extract_fn, min_count: int = 100):
    """Per-family micro PRF for one backend, one distributed pass.

    Negative templates (no gold entities) are first-class here: any
    prediction on them is a false positive, which is the point of the
    ambiguous family.  Returns a DataFrame (family, n_examples, tp, fp,
    fn_, precision, recall, f1).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    examples = generate_large_dataset(min_count, "all")
    rows = [(i, text, [(t, ty, s, s + len(t)) for (t, ty, s) in ents], fam)
            for i, (text, ents, _dom, _diff, fam) in enumerate(examples)]
    df = spark.createDataFrame(
        rows, "case_id long, text string, gold array<struct<text string, "
              "etype string, start long, end long>>, family string")

    def run(batches):
        from anno_spark.eval import evaluator as EV

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                pred = [(m.start, m.end, m.entity_type)
                        for m in extract_fn(row["text"])]
                gold = [(g["start"], g["end"], g["etype"])
                        for g in row["gold"]]
                cm = EV.evaluate_test_case(pred, gold)
                out.append((row["family"], cm.correct,
                            cm.found - cm.correct,
                            cm.expected - cm.correct))
            yield pd.DataFrame(out, columns=["family", "tp", "fp", "fn"])

    from anno_spark.eval.modes import add_prf_columns

    counts = df.mapInPandas(
        run, schema="family string, tp long, fp long, fn long")
    totals = counts.groupBy("family").agg(
        F.count("*").alias("n_examples"),
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn_"))
    return add_prf_columns(totals, fn_col="fn_")

"""Ground-truth validation for NER evaluation inputs.

Behavioral port of the reference validation utilities (reference:
anno/src/eval/validation.rs:1-257): span bounds, non-empty spans,
text↔span agreement, overlap detection, and cross-case type
consistency.  The standard evaluator runs this before scoring
(evaluator.rs:327-345) — invalid gold is an error, mismatched surface
text only a warning (which is exactly the tolerance the transcribed
corpora's pinned offset quirks rely on).

Distributed form: a mentions/gold DataFrame validates with one
``applyInPandas`` pass per document emitting (kind, message) rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["ValidationResult", "validate_ground_truth_entities",
           "validate_entity_type_consistency", "validate_gold_df"]


@dataclass
class ValidationResult:
    is_valid: bool = True
    errors: list = field(default_factory=list)
    warnings: list = field(default_factory=list)

    def add_error(self, error: str) -> None:
        self.is_valid = False
        self.errors.append(error)

    def add_warning(self, warning: str) -> None:
        self.warnings.append(warning)

    def raise_if_invalid(self) -> None:
        """into_result (validation.rs:46-56)."""
        if not self.is_valid:
            raise ValueError("Validation failed: " + "; ".join(self.errors))


def validate_ground_truth_entities(text: str, entities: list,
                                   strict: bool = False) -> ValidationResult:
    """``entities`` = (text, entity_type, start, end) tuples.

    Checks transcribed in order (validation.rs:80-161): whitespace-only
    surface (warning), bounds (errors, with ``continue`` so later checks
    are skipped for that entity), empty span (error), surface mismatch
    (warning), then pairwise overlap (error iff ``strict``).
    """
    result = ValidationResult()
    n = len(text)

    for i, (etext, _etype, start, end) in enumerate(entities):
        if not etext.strip():
            result.add_warning(
                f"Entity {i}: text is empty or whitespace-only: '{etext}'")
        if start >= n:
            result.add_error(
                f"Entity {i}: start position {start} out of bounds "
                f"(text length: {n} chars)")
            continue
        if end > n:
            result.add_error(
                f"Entity {i}: end position {end} out of bounds "
                f"(text length: {n} chars)")
            continue
        if start >= end:
            result.add_error(
                f"Entity {i}: invalid span (start {start} >= end {end})")
            continue
        span_text = text[start:end]
        if span_text != etext:
            result.add_warning(
                f"Entity {i}: text mismatch. Expected '{etext}', "
                f"found '{span_text}'")

    for i in range(len(entities)):
        for j in range(i + 1, len(entities)):
            (_t1, _e1, s1, e1) = entities[i]
            (_t2, _e2, s2, e2) = entities[j]
            if s1 < e2 and s2 < e1:
                msg = (f"Entities {i} and {j} overlap: "
                       f"[{s1}, {e1}) and [{s2}, {e2})")
                if strict:
                    result.add_error(msg)
                else:
                    result.add_warning(msg)
    return result


def validate_entity_type_consistency(test_cases: list) -> ValidationResult:
    """Same type string must map to one type across cases
    (validation.rs:166-193).  With the engine's string labels the check
    degenerates to always-consistent — kept for API parity, and it still
    flags case-variant labels (e.g. 'Per' vs 'PER')."""
    result = ValidationResult()
    type_map: dict = {}
    for case_idx, (_text, entities) in enumerate(test_cases):
        for (_etext, etype, _s, _e) in entities:
            key = etype.upper()
            if key in type_map:
                if type_map[key] != etype:
                    result.add_warning(
                        f"Test case {case_idx}: Entity type '{key}' "
                        f"inconsistent with previous usage")
            else:
                type_map[key] = etype
    return result


def validate_gold_df(docs, gold, doc_col: str = "url",
                     strict: bool = False):
    """Distributed validation: (doc_col, kind, message) rows for every
    finding; empty DataFrame == fully valid corpus."""
    import pandas as pd
    from pyspark.sql import functions as F

    texts = docs.select(F.col(doc_col).cast("string").alias("doc_id"), "text")
    ents = gold.select(
        F.col(doc_col).cast("string").alias("doc_id"),
        F.col("text").alias("etext"), F.col("entity_type"),
        F.col("start").cast("long"), F.col("end").cast("long"))
    joined = ents.join(texts.withColumnRenamed("text", "doc_text"), "doc_id")

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, grp in pdf.groupby("doc_id"):
            entities = [(r["etext"], r["entity_type"], r["start"], r["end"])
                        for _, r in grp.sort_values(["start", "end"]).iterrows()]
            res = validate_ground_truth_entities(
                grp["doc_text"].iloc[0], entities, strict)
            out += [(doc_id, "error", e) for e in res.errors]
            out += [(doc_id, "warning", w) for w in res.warnings]
        return pd.DataFrame(out, columns=["doc_id", "kind", "message"])

    return joined.groupBy("doc_id").applyInPandas(
        check, schema="doc_id string, kind string, message string")

"""Relation gold corpus: transcription integrity, strict scoring, and
the distributed relation_eval tie-in.

Reference: anno/src/eval/dataset/synthetic/relations.rs +
anno/src/eval/relation.rs strict semantics.
"""

from __future__ import annotations

import pytest

from anno_spark.eval import relation_corpus as RC


def test_corpus_shape():
    ds = RC.dataset()
    assert len(ds) == 16
    assert sum(len(e[1]) for e in ds) == 31
    rel_types = {r[-1] for (_, rels, _, _) in ds for r in rels}
    assert {"FOUNDED", "WORKS_FOR", "LOCATED_IN", "CEO_OF",
            "ACQUIRED"} <= rel_types
    assert {e[2] for e in ds} == {"Easy", "Medium", "Hard"}
    assert {e[3] for e in ds} >= {"Business", "General", "Biography"}


# five hand-authored reference offsets are off by 1-2 chars; pinned
_REFERENCE_SPAN_QUIRKS = {
    ("The company, which was establi", "Larry Page"),
    ("The company, which was establi", "Sergey Brin"),
    ("The company, which was establi", "Mountain View"),
    ("Einstein published the theory ", "theory of relativity"),
    ("Einstein published the theory ", "Swiss Patent Office"),
}


def test_spans_locate_text_except_pinned_quirks():
    mismatched = set()
    for (text, rels, _d, _dom) in RC.dataset():
        for ((hs, he), _ht, htx, (ts, te), _tt, ttx, _rel) in rels:
            if text[hs:he] != htx:
                mismatched.add((text[:30], htx))
            if text[ts:te] != ttx:
                mismatched.add((text[:30], ttx))
    assert mismatched == _REFERENCE_SPAN_QUIRKS


def test_filters():
    assert all(e[2] == "Easy" for e in RC.by_difficulty("Easy"))
    # 5 from easy_relations + 2 Easy examples in the domain generators
    assert len(RC.by_difficulty("Easy")) == 7
    assert all(e[3] == "Business" for e in RC.by_domain("Business"))


def test_strict_prf_semantics():
    gold = [((0, 10), (19, 24), "FOUNDED")]
    # exact match, case-insensitive relation
    assert RC.strict_prf([((0, 10), (19, 24), "founded")], gold) == \
        (1.0, 1.0, 1.0)
    # span off by one -> no match
    p, r, f1 = RC.strict_prf([((0, 11), (19, 24), "FOUNDED")], gold)
    assert (p, r, f1) == (0.0, 0.0, 0.0)
    # duplicate predictions cannot double-match one gold (1-1 greedy)
    p, r, _ = RC.strict_prf(
        [((0, 10), (19, 24), "FOUNDED"), ((0, 10), (19, 24), "FOUNDED")],
        gold)
    assert p == pytest.approx(0.5)
    assert r == pytest.approx(1.0)


def test_engine_extractor_finds_easy_relations():
    out = RC.evaluate_extractor()
    assert out["n_gold"] == 31
    # the trigger-pattern tier should land at least some strict easy hits
    easy = out["by_difficulty"]["Easy"]
    assert easy["recall"] > 0.0
    assert 0.0 <= out["f1"] <= 1.0


def test_examples_df_matches_relation_eval(spark):
    """The corpus drives the DRIVER-GRADE relation_eval: engine triples
    scored against exploded gold must agree with the pure strict_prf."""
    import pandas as pd

    from anno_spark.core.document import extract_document
    from anno_spark.eval import relation_eval

    corpus, gold = RC.examples_df(spark)

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for t in extract_document(row["text"]).triples:
                    out.append((str(row["example_id"]), t.subj_start,
                                t.subj_end, t.obj_start, t.obj_end, t.pred))
            yield pd.DataFrame(out, columns=[
                "url", "subj_start", "subj_end", "obj_start", "obj_end",
                "pred"])

    pred = corpus.mapInPandas(
        run, schema="url string, subj_start long, subj_end long, "
                    "obj_start long, obj_end long, pred string")
    prf = relation_eval.relation_prf(pred, gold)

    # pure-python oracle over the same per-document pairs
    all_pred, all_gold = [], []
    for (text, rels, _d, _dom) in RC.dataset():
        all_pred.extend([((t.subj_start, t.subj_end),
                          (t.obj_start, t.obj_end), t.pred)
                         for t in extract_document(text).triples])
        all_gold.extend([(hs, ts, rel)
                         for (hs, _ht, _htx, ts, _tt, _ttx, rel) in rels])
    p, r, f1 = RC.strict_prf(all_pred, all_gold)
    # NOTE: relation_eval keys per url, strict_prf pools — identical here
    # because spans never collide across these 16 texts
    assert prf.precision == pytest.approx(p)
    assert prf.recall == pytest.approx(r)
    assert prf.f1 == pytest.approx(f1)

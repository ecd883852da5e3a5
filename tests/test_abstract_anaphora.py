"""Abstract-anaphora eval tests (anno_spark/eval/abstract_anaphora.py +
anno_spark/core/discourse.py vs anno/src/eval/abstract_anaphora.rs and
anno/src/discourse/types.rs). Reference test expectations transcribed
from abstract_anaphora.rs:3291-3460 and types.rs:1134-1300."""

from __future__ import annotations

import pytest

import anno_spark.core.discourse as dc
import anno_spark.eval.abstract_anaphora as aa


class TestDiscourseTypes:
    def test_referent_types(self):
        assert not dc.is_abstract_referent("nominal")
        for t in ("event", "fact", "proposition", "situation", "manner",
                  "segment"):
            assert dc.is_abstract_referent(t)
        assert dc.can_be_this_antecedent("event")
        assert not dc.can_be_this_antecedent("nominal")
        assert dc.can_be_it_antecedent("situation")
        assert not dc.can_be_it_antecedent("fact")

    def test_shell_noun_classification(self):
        # types.rs test_shell_noun_classification
        assert dc.classify_shell_noun("problem") == "circumstantial"
        assert dc.classify_shell_noun("fact") == "factual"
        assert dc.classify_shell_noun("idea") == "mental"
        assert dc.classify_shell_noun("possibility") == "modal"
        assert dc.classify_shell_noun("event") == "eventive"
        assert dc.classify_shell_noun("claim") == "linguistic"
        assert dc.classify_shell_noun("zebra") is None
        assert dc.is_shell_noun("Problem")  # case-insensitive

    def test_shell_noun_antecedent_types(self):
        assert dc.shell_noun_antecedent_types("factual") == ("fact", "event")
        assert dc.shell_noun_antecedent_types("circumstantial") == ("situation",)

    def test_demonstrative(self):
        assert dc.is_demonstrative_determiner("this")
        assert dc.is_demonstrative_determiner("Those")
        assert not dc.is_demonstrative_determiner("the")
        assert not dc.is_demonstrative_determiner(None)

    def test_discourse_scope_sentences(self):
        # types.rs test_discourse_scope_sentences
        text = "Russia invaded Ukraine. This caused inflation. The crisis deepened."
        scope = dc.DiscourseScope.analyze(text)
        assert scope.sentence_count() == 3

    def test_discourse_scope_clauses(self):
        text = "Prices rose, and wages fell. This was unsustainable."
        scope = dc.DiscourseScope.analyze(text)
        assert scope.clause_count() >= 2

    def test_candidate_antecedent_spans(self):
        # types.rs test_candidate_antecedent_spans
        text = "Russia invaded Ukraine in 2022. This caused a global energy crisis."
        scope = dc.DiscourseScope.analyze(text)
        candidates = scope.candidate_antecedent_spans(32)
        assert candidates
        first = scope.extract_span(text, candidates[0][0], candidates[0][1])
        assert "invaded" in first

    def test_sentence_clause_at(self):
        text = "One. Two here."
        scope = dc.DiscourseScope.analyze(text)
        assert scope.sentence_at(1) == (0, 4)
        assert scope.sentence_at(6)[0] == 4
        assert scope.sentence_at(999) is None

    def test_simple_stem(self):
        # types.rs test_event_coref_trigger_matching — the doc comment
        # claims invade/invaded/invasion unify but the code stems them to
        # invade/invad/invas; only the inflection family matches.
        assert dc.triggers_match("attack", "attack")
        assert dc.triggers_match("attack", "attacks")
        assert dc.triggers_match("attack", "attacked")
        assert dc.triggers_match("attack", "attacking")
        assert dc.triggers_match("Attack", "ATTACKING")
        assert not dc.triggers_match("attack", "meeting")
        assert not dc.triggers_match("invaded", "invasion")  # quirk pinned
        assert dc.simple_stem("running") == "run"  # doubled-consonant pop

    def test_event_coref_resolver(self):
        # types.rs test_event_coref_resolver_simple
        mentions = [
            dc.event_mention("attacked", 10, 18, "attack",
                             [("Agent", "Russia"), ("Patient", "Ukraine")]),
            dc.event_mention("attack", 50, 56, "attack",
                             [("Agent", "Russia")]),
            dc.event_mention("meeting", 100, 107, "meeting",
                             [("Participant", "leaders")]),
        ]
        clusters = dc.resolve_event_coref(mentions)
        assert len(clusters) == 2
        assert dc.canonical_trigger(clusters[0]) == "attacked"
        assert len(clusters[0]["mentions"]) == 2
        assert len(clusters[1]["mentions"]) == 1

    def test_event_coref_type_gate(self):
        a = dc.event_mention("strike", 0, 6, "conflict:attack")
        b = dc.event_mention("strike", 20, 26, "business:strike")
        assert not dc.should_corefer(a, b)
        assert dc.should_corefer(a, b, require_type_match=False)

    def test_arg_overlap(self):
        a = dc.event_mention("met", 0, 3, arguments=[("Agent", "Alice"),
                                                     ("Patient", "Bob")])
        b = dc.event_mention("meeting", 10, 17,
                             arguments=[("Agent", "Alice Smith")])
        # Agent matches by containment → 1 match / max(2,1)
        assert dc.arg_overlap(a, b) == pytest.approx(0.5)
        empty = dc.event_mention("met", 0, 3)
        assert dc.arg_overlap(empty, empty) == 1.0


class TestDatasets:
    def test_dataset_creation(self):
        stats = aa.dataset_stats(aa.dataset("standard"))
        assert stats["total"] > 0
        assert stats["nominal"] > 0
        assert stats["abstract_total"] > 0

    def test_comprehensive_size(self):
        cases = aa.comprehensive_dataset()
        assert len(cases) == 86
        ids = [c["id"] for c in cases]
        assert len(set(ids)) == len(ids)  # unique ids

    def test_domain_datasets(self):
        # abstract_anaphora.rs:3367-3430 bounds
        legal = aa.dataset_stats(aa.dataset("legal"))
        assert legal["total"] >= 8 and legal["abstract_total"] >= 7
        assert legal["nominal"] >= 1
        medical = aa.dataset_stats(aa.dataset("medical"))
        assert medical["total"] >= 8 and medical["event"] >= 3
        financial = aa.dataset_stats(aa.dataset("financial"))
        assert financial["total"] >= 8 and financial["event"] >= 4
        scientific = aa.dataset_stats(aa.dataset("scientific"))
        assert scientific["total"] >= 8 and scientific["fact"] >= 3

    def test_spans_mostly_slice_text(self):
        # 11 of the 86 reference-authored anaphor offsets are off by 1-2
        # chars in the reference source itself (e.g. nom_01 says 32-34
        # for an "He" at 30-32); its evaluator tolerates this via the
        # `start == X || text_matches` fallback. Pin the count so data
        # drift is caught without "fixing" the reference's spans.
        mismatched = []
        for case in aa.comprehensive_dataset():
            t = case["text"]
            ante, ana = case["antecedent"], case["anaphor"]
            if t[ana["start"]:ana["end"]] != ana["text"]:
                mismatched.append(case["id"])
            assert 0 <= ante["start"] <= len(t), case["id"]
        assert len(mismatched) == 11, mismatched
        assert "nom_01" in mismatched

    def test_text_fallback_rescues_bad_offsets(self):
        # nom_01 has a wrong anaphor offset; the evaluator still scores
        # it because entity lookup falls back to normalized text match
        case = next(c for c in aa.dataset("standard") if c["id"] == "nom_01")
        res = aa.evaluate_case(case)
        assert res["anaphor_found"]


class TestEvaluator:
    def test_nominal_beats_abstract(self):
        # abstract_anaphora.rs test_evaluation_runs / test_accuracy_gap_exists
        r = aa.evaluate(aa.dataset("standard"))
        assert r["nominal_accuracy"] >= r["abstract_accuracy"]
        if r["nominal_accuracy"] > 0.0:
            assert r["nominal_accuracy"] - r["abstract_accuracy"] > 0.0

    def test_simple_resolver_fails_abstract(self):
        r = aa.evaluate(aa.dataset("standard"))
        assert r["abstract_correct"] == 0  # the research point
        for res in r["case_results"]:
            if res["anaphora_type"] != "nominal":
                assert "Abstract anaphora" in res["failure_reason"]

    def test_discourse_resolver_recovers_abstract(self):
        simple = aa.evaluate(aa.dataset("standard"))
        discourse = aa.evaluate(aa.dataset("standard"), use_discourse=True)
        assert discourse["abstract_accuracy"] > simple["abstract_accuracy"]
        assert discourse["abstract_accuracy"] >= 0.5
        # nominal path identical in both modes
        assert discourse["nominal_correct"] == simple["nominal_correct"]

    def test_by_type_breakdown_excludes_nominal(self):
        r = aa.evaluate(aa.dataset("standard"), use_discourse=True)
        assert "nominal" not in r["by_type"]
        assert set(r["by_type"]) <= {"event", "fact", "proposition",
                                     "situation"}

    def test_infer_entity_type(self):
        assert aa.infer_entity_type("he") == "PER"
        assert aa.infer_entity_type("The company") == "ORG"
        assert aa.infer_entity_type("Acme Corp.") == "ORG"
        assert aa.infer_entity_type("Dr. Chen") == "PER"
        assert aa.infer_entity_type("Zanzibar") == "PER"  # default proper
        assert aa.infer_entity_type("nothing") == "unknown"

    def test_detect_shell_noun(self):
        s = aa.detect_shell_noun("this problem")
        assert s == {"lemma": "problem", "class": "circumstantial",
                     "determiner": "this", "full_text": "this problem"}
        assert aa.detect_shell_noun("fact")["class"] == "factual"
        assert aa.detect_shell_noun("this zebra") is None
        assert aa.detect_shell_noun("he") is None

    def test_analyze_shell_nouns(self):
        analysis = aa.analyze_shell_nouns(aa.comprehensive_dataset())
        assert analysis["total_shell_nouns"] > 0
        assert 0.0 <= analysis["demonstrative_ratio"] <= 1.0
        assert analysis["type_match_count"] <= analysis["total_shell_nouns"]

    def test_ranking_metrics(self):
        m = aa.ranking_metrics([(1, 5), (2, 4), (0, 3)])
        assert m["accuracy_at_1"] == pytest.approx(1 / 3)
        assert m["mrr"] == pytest.approx((1.0 + 0.5) / 3)
        assert m["containment"] == pytest.approx(2 / 3)
        assert m["avg_candidates"] == pytest.approx(4.0)
        assert aa.ranking_metrics([])["total_cases"] == 0

    def test_diagnose_failure_nominal_branches(self):
        case = aa.dataset("standard")[0]
        assert "different clusters" in aa.diagnose_failure(case, 1, 2)
        assert "Antecedent" in aa.diagnose_failure(case, None, 1)
        assert "Neither" in aa.diagnose_failure(case, None, None)


class TestSparkPath:
    def test_distributed_matches_local(self, spark):
        cases = aa.comprehensive_dataset()
        df = aa.cases_df(spark, cases)
        results = aa.evaluate_df(df, use_discourse=True)
        rows = {r.case_id: r for r in results.collect()}
        local = aa.evaluate(cases, use_discourse=True)
        assert len(rows) == len(cases)
        for res in local["case_results"]:
            assert rows[res["case_id"]].resolved_correctly == \
                res["resolved_correctly"], res["case_id"]

    def test_accuracy_rollup(self, spark):
        cases = aa.dataset("standard")
        results = aa.evaluate_df(aa.cases_df(spark, cases),
                                 use_discourse=True)
        by = {r.anaphora_type: r for r in aa.accuracy_by_type(results).collect()}
        local = aa.evaluate(cases, use_discourse=True)
        assert by["abstract"].total == local["abstract_total"]
        assert by["abstract"].correct == local["abstract_correct"]
        assert by["nominal"].correct == local["nominal_correct"]
        for t, tr in local["by_type"].items():
            assert by[t].total == tr["total"] and by[t].correct == tr["correct"]

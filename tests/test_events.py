"""R2 event extraction tests (transcribed from the reference suite,
event_extractor.rs:1537+ and docs examples)."""

from __future__ import annotations

from anno_spark.core import events as ev


class TestEventCore:
    def test_conflict_attack(self):
        out = ev.extract_events("Russia invaded Ukraine in 2022.")
        assert len(out) == 1
        e = out[0]
        assert e.event_type == "conflict:attack"
        assert e.trigger == "invaded"
        assert e.tense == ev.PAST
        assert e.polarity == ev.POSITIVE
        assert ("Agent", "Russia") in e.arguments
        assert ("Patient", "Ukraine") in e.arguments

    def test_negated_polarity(self):
        out = ev.extract_events("The army did not attack the city.")
        assert out[0].polarity == ev.NEGATIVE

    def test_modal_uncertain(self):
        out = ev.extract_events("They could attack tomorrow.")
        assert out[0].polarity == ev.UNCERTAIN
        assert out[0].tense == ev.HYPOTHETICAL

    def test_future_tense(self):
        out = ev.extract_events("The company will announce results.")
        assert out[0].tense == ev.FUTURE

    def test_present_ing(self):
        out = ev.extract_events("Protesters are marching and protesting downtown.")
        hits = [e for e in out if e.event_type == "conflict:demonstrate"]
        assert hits and hits[0].tense == ev.PRESENT

    def test_tokenizer_offsets(self):
        toks = ev.tokenize("Hello, world-wide web's edge!")
        assert toks[0] == ("Hello", 0, 5)
        assert toks[1] == ("world-wide", 7, 17)
        assert toks[2] == ("web's", 18, 23)

    def test_entity_override(self):
        from anno_spark.core.entity import Mention

        text = "Acme Corp. acquired Globex yesterday."
        ents = [
            Mention("Acme Corp", "ORG", 0, 9, 0.85, "org_suffix", "heuristic"),
            Mention("Globex", "ORG", 20, 26, 0.8, "known_org", "heuristic"),
        ]
        out = ev.extract_events_with_entities(text, ents)
        assert out[0].event_type == "transaction:transfer"
        args = dict(out[0].arguments)
        assert args["Agent"] == "Acme Corp"
        assert args["Patient"] == "Globex"

    def test_sentence_start_not_agent(self):
        out = ev.extract_events("The protest started.")
        args = dict(out[0].arguments)
        assert args.get("Agent") != "The"


class TestEventOperator:
    def test_events_table(self, spark):
        from anno_spark.operators.events import events_table

        pages = spark.createDataFrame(
            [
                ("u1", "Russia invaded Ukraine in 2022."),
                ("u2", "Apple Inc. will announce new products."),
                ("u3", "Nothing happens here."),
            ],
            "url string, text string",
        )
        rows = {r["url"]: r for r in events_table(pages).collect()}
        assert rows["u1"]["event_type"] == "conflict:attack"
        assert rows["u1"]["agent"] == "Russia"
        assert rows["u2"]["event_type"] == "contact:communicate"
        assert rows["u2"]["tense"] == "future"
        assert "u3" not in rows


class TestFusedEventsParity:
    def test_fused_pass_matches_standalone(self, spark):
        """VERDICT r01 fix #3 acceptance: events extracted inside the
        single extraction pass (extract.events_table) must equal the
        standalone operator's output row-for-row."""
        from anno_spark.operators import extract as ex
        from anno_spark.operators.events import events_table
        from anno_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, 60).localCheckpoint()
        fused = sorted(map(tuple, ex.events_table(ex.extract_documents(pages)).collect()))
        standalone = sorted(map(tuple, events_table(pages).collect()))
        assert fused == standalone
        assert len(fused) > 0

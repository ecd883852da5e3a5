"""Eval-dataset loader tests — registry, format parsers, BIO decode, and
through-Spark parity for anno_spark/sources/datasets.py.

Expected values transcribed from the reference's own tests
(loader.rs:4229-4456: test_parse_bio_tag, test_map_entity_type,
test_dataset_id_display/from_str, test_annotated_sentence_text/entities,
test_parse_conll_format, test_parse_conll2003_format,
test_type_mapper_*) plus quirk pins for behaviors documented inline in
the source module.
"""

from __future__ import annotations

import json

import pytest

from anno_spark.sources import datasets as ds
from anno_spark.sources.datasets import (
    FIXTURES,
    bio_entities,
    parse_bio_tag,
    parse_conll,
)


# --------------------------------------------------------------------------
# registry (DatasetId surface)


class TestRegistry:
    def test_dataset_count_is_40_plus(self):
        assert len(ds.DATASETS) == 64  # loader.rs:84-404 enum arity

    def test_display_names(self):
        # loader.rs test_dataset_id_display
        assert ds.DATASETS["wikigold"].name == "WikiGold"
        assert ds.DATASETS["wnut17"].name == "WNUT-17"

    def test_from_str_aliases(self):
        # loader.rs test_dataset_id_from_str
        assert ds.dataset_from_str("wikigold").key == "wikigold"
        assert ds.dataset_from_str("wnut-17").key == "wnut17"
        assert ds.dataset_from_str("mit_movie").key == "mit_movie"
        assert ds.dataset_from_str("TACRED").key == "retacred"
        assert ds.dataset_from_str("pan-x").key == "wikiann"
        with pytest.raises(ValueError):
            ds.dataset_from_str("not_a_dataset")

    def test_category_predicates(self):
        # loader.rs:784-895 — exact memberships
        assert ds.datasets_in_category("coref") == [
            "gap", "preco", "litbank", "ecb_plus", "wikicoref"]
        assert ds.datasets_in_category("biomedical") == [
            "bc5cdr", "ncbi_disease", "genia", "anatem", "bc2gm", "bc4chemd"]
        assert ds.datasets_in_category("social_media") == [
            "wnut17", "tweetner7", "broad_twitter"]
        assert ds.datasets_in_category("specialized") == [
            "mit_movie", "mit_restaurant", "fabner"]
        assert ds.datasets_in_category("discontinuous") == ["cadec"]
        assert ds.datasets_in_category("few_shot") == [
            "fewnerd", "crossner", "universalner_bench"]
        assert len(ds.datasets_in_category("relation")) == 9
        assert set(ds.datasets_in_category("multilingual")) == {
            "wikiann", "multiconer", "multiconer_v2", "multinerd",
            "wikineural", "polyglot_ner", "universal_ner", "uner", "msner",
            "mixred"}

    def test_groupings(self):
        assert ds.quick_datasets() == ["wikigold", "mit_movie", "gap"]
        assert len(ds.medium_datasets()) == 6
        assert len(ds.all_ner_datasets()) == 25
        assert len(ds.all_datasets()) == 64
        # every grouped key resolves
        for key in ds.all_ner_datasets() + ds.medium_datasets():
            assert key in ds.DATASETS

    def test_metadata_well_formed(self):
        seen_cache = set()
        for info in ds.DATASETS.values():
            assert info.url.startswith("https://")
            assert info.entity_types, info.key
            lo, hi = info.expected_entities
            assert 0 < lo < hi, info.key
            assert info.cache_filename not in seen_cache, info.key
            seen_cache.add(info.cache_filename)
            # every format has a fixture (i.e. the parser is exercised)
            assert ds.fixture_content(info.key)

    def test_type_mappers(self):
        # loader.rs test_type_mapper_mit_movie / _standard / _biomedical
        m = ds.type_mapper_for("mit_movie")
        assert m is not None and m.normalize("ACTOR") == "PER"
        assert ds.type_mapper_for("wikigold") is None
        assert ds.type_mapper_for("conll2003") is None
        assert ds.type_mapper_for("wnut17") is None
        bio = ds.type_mapper_for("bc5cdr")
        assert bio is not None
        assert "DISEASE" in bio.normalize("DISEASE").upper() or \
            bio.normalize("DISEASE") != ""

    def test_temporal_metadata(self):
        # loader.rs:2050-2084
        assert ds.temporal_metadata("tweetner7")["temporal_cutoff"] == "2017-01-01"
        assert ds.temporal_metadata("broad_twitter")["temporal_cutoff"] == "2018-01-01"
        assert ds.temporal_metadata("genia")["kb_version"] == "UMLS-2023"
        assert ds.temporal_metadata("wikigold") is None


# --------------------------------------------------------------------------
# BIO tag parsing + entity decode


class TestBioDecode:
    def test_parse_bio_tag(self):
        # loader.rs test_parse_bio_tag
        assert parse_bio_tag("O") == ("O", "")
        assert parse_bio_tag("B-PER") == ("B", "PER")
        assert parse_bio_tag("I-LOC") == ("I", "LOC")
        assert parse_bio_tag("B-ORG") == ("B", "ORG")
        # bare tag → implicit B with the whole tag as type
        assert parse_bio_tag("LOC") == ("B", "LOC")
        assert parse_bio_tag("I") == ("B", "I")

    def test_entities_reference_case(self):
        # loader.rs test_annotated_sentence_entities
        toks = ["John", "Smith", "works", "at", "Google"]
        tags = ["B-PER", "I-PER", "O", "O", "B-ORG"]
        ents = bio_entities(toks, tags)
        assert len(ents) == 2
        assert ents[0]["text"] == "John Smith"
        assert ents[0]["entity_type"] == "PER"
        assert ents[1]["text"] == "Google"
        assert ents[1]["entity_type"] == "ORG"

    def test_char_offsets_space_join(self):
        toks = ["John", "lives", "in", "New", "York"]
        tags = ["B-PER", "O", "O", "B-LOC", "I-LOC"]
        text = " ".join(toks)  # AnnotatedSentence::text
        assert text == "John lives in New York"
        ents = bio_entities(toks, tags)
        for e in ents:
            assert text[e["start"]:e["end"]] == e["text"]
        assert ents[1]["text"] == "New York" and ents[1]["start"] == 14

    def test_iob1_restart(self):
        # I- after O of same type starts a new entity (IOB1)
        ents = bio_entities(["a", "b"], ["I-PER", "I-PER"])
        assert len(ents) == 1 and ents[0]["text"] == "a b"
        # type switch inside I-run splits
        ents = bio_entities(["a", "b"], ["I-PER", "I-ORG"])
        assert [e["text"] for e in ents] == ["a", "b"]
        # B of different type then I of another restarts
        ents = bio_entities(["a", "b"], ["B-PER", "I-ORG"])
        assert [e["original_label"] for e in ents] == ["PER", "ORG"]

    def test_es_prefixes_fall_to_o_arm(self):
        # the reference's match is B/I/_ — E-/S- close entities like O
        ents = bio_entities(["a", "b", "c"], ["B-PER", "E-PER", "S-LOC"])
        assert len(ents) == 1 and ents[0]["text"] == "a"

    def test_map_entity_type_reference_cases(self):
        # loader.rs test_map_entity_type (via schema::map_to_canonical)
        from anno_spark.operators.schema_map import map_to_canonical as m
        assert m("PER") == "PER" and m("PERSON") == "PER"
        assert m("LOC") == "LOC" and m("ORG") == "ORG"
        assert m("GPE") == "GPE"            # preserved, not LOC
        assert m("MISC") == "MISC"
        assert m("PRODUCT") == "PRODUCT"    # OntoNotes types kept custom
        assert m("EVENT") == "EVENT"
        assert m("WORK_OF_ART") == "WORK_OF_ART"
        assert m("CARDINAL") == "CARDINAL"
        assert m("NORP") == "GROUP"         # NORP is GROUP, not ORG
        assert m("ZYXW") == "ZYXW"          # unknown preserved

    def test_original_label_vs_canonical(self):
        ents = bio_entities(["Paris"], ["B-GPE"])
        assert ents[0]["original_label"] == "GPE"
        assert ents[0]["entity_type"] == "GPE"  # canonical keeps GPE distinct
        ents = bio_entities(["IBM"], ["B-corporation"])
        assert ents[0]["entity_type"] == "ORG"


# --------------------------------------------------------------------------
# format parsers (fixtures transcribe the reference's own test content)


class TestFormatParsers:
    def test_conll_two_column(self):
        # loader.rs test_parse_conll_format: 2 sentences, 3 entities
        sents = parse_conll(FIXTURES["conll2"])
        assert len(sents) == 2
        n = sum(len(bio_entities([t for t, _ in s], [g for _, g in s]))
                for s in sents)
        assert n == 3

    def test_conll_2003_four_column(self):
        # loader.rs test_parse_conll2003_format
        sents = parse_conll(FIXTURES["conll4"])
        assert len(sents) == 2  # -DOCSTART- skipped
        e1 = bio_entities([t for t, _ in sents[0]], [g for _, g in sents[0]])
        assert len(e1) == 2  # EU (ORG), German (MISC)
        assert {e["original_label"] for e in e1} == {"ORG", "MISC"}
        e2 = bio_entities([t for t, _ in sents[1]], [g for _, g in sents[1]])
        assert len(e2) == 1 and e2[0]["text"] == "Peter Blackburn"

    def test_mit_tab_tag_first(self):
        sents = parse_conll(FIXTURES["mit"], mit=True)
        assert sents[0][0] == ("denzel", "B-Actor")
        assert sents[1][1] == ("comedy", "B-Genre")

    def test_jsonl_ner_multinerd_table(self):
        sents = ds.parse_jsonl_ner(FIXTURES["jsonl_ner"])
        assert sents[0] == [("Alice", "B-PER"), ("visited", "O"),
                            ("Paris", "B-LOC")]
        assert sents[1][1] == ("Jones", "I-PER")

    def test_jsonl_ner_skips_malformed(self):
        content = ('not json\n{"tokens": ["a"], "ner_tags": [1, 2]}\n'
                   '{"tokens": ["ok"], "ner_tags": [99]}\n')
        sents = ds.parse_jsonl_ner(content)
        # malformed + length-mismatch skipped; out-of-range tag → O
        assert sents == [[("ok", "O")]]

    def test_hf_api_response(self):
        assert ds.is_hf_api_response(FIXTURES["hf_api"])
        assert not ds.is_hf_api_response(FIXTURES["conll2"])
        sents = ds.parse_hf_api(FIXTURES["hf_api"])
        assert sents[0][0] == ("Marie", "B-PER")
        assert sents[0][1] == ("Curie", "I-PER")
        assert sents[0][3] == ("Sorbonne", "B-ORG")

    def test_hf_api_int_tag_without_names(self):
        content = json.dumps({"rows": [
            {"row": {"tokens": ["x"], "ner_tags": [7]}}]})
        assert ds.parse_hf_api(content) == [[("x", "TAG_7")]]

    def test_tweetner7_label_table(self):
        sents = ds.parse_tweetner7(FIXTURES["tweetner7"])
        assert sents[0][0] == ("Tesla", "B-corporation")
        assert sents[1] == [("Taylor", "B-person"), ("Swift", "I-person"),
                            ("sings", "O")]

    def test_docred_ner_view(self):
        sents = ds.parse_docred_ner(FIXTURES["docred"])
        assert sents[0][0] == ("Ada", "B-PERSON")      # uppercased type
        assert sents[0][1] == ("Lovelace", "I-PERSON")  # inclusive span end
        assert sents[0][4] == ("Babbage", "B-PERSON")
        assert sents[1][0] == ("Turing", "B-PERSON")

    def test_bc5cdr_entity_collapse_quirk(self):
        # loader.rs:3390-3404: Entity/CHEMICAL/DISEASE → CHEMICAL
        sents = ds.parse_bc5cdr(FIXTURES["bc5cdr"])
        assert sents[0][0] == ("Aspirin", "B-CHEMICAL")
        assert sents[0][2] == ("headaches", "I-CHEMICAL")
        assert sents[1] == [("Water", "O"), ("is", "O"), ("safe", "O")]

    def test_ncbi_keeps_tags(self):
        sents = ds.parse_ncbi_disease(FIXTURES["ncbi"])
        assert sents[0][0] == ("colorectal", "B-Disease")
        assert sents[0][1] == ("cancer", "I-Disease")

    def test_gap_ner_view_all_o(self):
        sents = ds.parse_gap_ner(FIXTURES["gap"])
        assert len(sents) == 2
        assert all(tag == "O" for s in sents for _, tag in s)

    def test_preco_ner_view(self):
        sents = ds.parse_preco_ner(FIXTURES["preco"])
        assert sents == [[("Anna", "O"), ("sat", "O")],
                         [("She", "O"), ("read", "O")]]

    def test_litbank_ner_view(self):
        sents = ds.parse_litbank_ner(FIXTURES["litbank"])
        assert len(sents) == 1  # single synthetic sentence
        assert ("Alice", "B-PER") in sents[0]
        assert ("London", "B-LOC") in sents[0]

    def test_ecb_plus_csv(self):
        sents = ds.parse_ecb_plus(FIXTURES["ecb_plus"])
        assert len(sents) == 2
        assert [t for t, _ in sents[0]] == ["The", "board", "announced", "a",
                                            "merger"]

    def test_cadec_discontinuous_spans(self):
        sents = ds.parse_cadec_jsonl(FIXTURES["cadec"])
        assert sents[0] == [("severe", "B-ADR"), ("pain", "I-ADR"),
                            ("in", "O"), ("legs", "B-ADR")]
        assert sents[1] == [("took", "O"), ("ibuprofen", "B-drug"),
                            ("daily", "O")]
        assert sents[2] == [("felt", "O"), ("dizzy", "B-ADR")]

    def test_cadec_hf_all_b_quirk(self):
        # loader.rs:3135-3145: the B/I choice checks !last.starts_with("I-"),
        # so consecutive ADE words each restart as B — transcribed.
        sents = ds.parse_cadec_hf_api(FIXTURES["cadec_hf"])
        tags = [g for _, g in sents[0]]
        assert tags == ["O", "O", "B-adverse_drug_event",
                        "B-adverse_drug_event", "O", "O", "O"]

    def test_dispatch_hf_autodetect_wins(self):
        # JNLPBA is declared conll but its URL serves HF-API JSON — the
        # auto-detect must route it (loader.rs:2087-2090)
        sents = ds.parse_ner_content(FIXTURES["hf_api"], "jnlpba")
        assert sents[0][0] == ("Marie", "B-PER")

    def test_dispatch_per_format(self):
        for key in ["wikigold", "mit_movie", "multinerd", "tweetner7",
                    "docred", "cadec", "bc5cdr", "ncbi_disease", "gap",
                    "preco", "litbank", "ecb_plus", "genia"]:
            assert ds.parse_ner_content(ds.fixture_content(key), key)


# --------------------------------------------------------------------------
# coref + relation loaders


class TestCorefLoader:
    def test_gap_chains_coref_a(self):
        docs = ds.parse_coref_content(FIXTURES["gap"], "gap")
        assert len(docs) == 2
        chains = docs[0]["chains"]
        assert len(chains) == 2
        assert [m["text"] for m in chains[0]] == ["Alice", "she"]
        assert chains[0][1]["mention_type"] == "pronoun"
        assert [m["text"] for m in chains[1]] == ["Beth"]  # singleton
        # offsets slice the text
        t = docs[0]["text"]
        for ch in chains:
            for m in ch:
                assert t[m["start"]:m["end"]] == m["text"]

    def test_gap_chains_coref_b(self):
        docs = ds.parse_coref_content(FIXTURES["gap"], "gap")
        chains = docs[1]["chains"]
        assert [m["text"] for m in chains[1]] == ["Dave", "he"]

    def test_gap_neither_three_singletons(self):
        content = (FIXTURES["gap"].splitlines()[0] + "\n"
                   "t3\tEve met Fay then it rained\tit\t17\tEve\t0\tFALSE\t"
                   "Fay\t8\tFALSE\tu\n")
        docs = ds.parse_coref_content(content, "gap")
        assert [len(c) for c in docs[0]["chains"]] == [1, 1, 1]

    def test_preco_text_rebuild_and_clusters(self):
        docs = ds.parse_preco_coref(FIXTURES["preco"])
        doc = docs[0]
        assert doc["text"] == "Anna sat She read "  # trailing space/sentence
        ch = doc["chains"][0]
        assert [(m["text"], m["start"], m["end"]) for m in ch] == [
            ("Anna", 0, 4), ("She", 9, 12)]

    def test_litbank_standard_brat_lines_degenerate(self):
        # quirk pin: whitespace-split puts "Coref" at parts[1] → no chain
        content = ("T1\tPER 0 5\tAlice\nT2\tPER 20 23\tshe\n"
                   "R1\tCoref Arg1:T1 Arg2:T2\n")
        docs = ds.parse_litbank_coref(content)
        assert docs[0]["chains"] == []

    def test_litbank_chain_merge(self):
        docs = ds.parse_coref_content(FIXTURES["litbank"], "litbank")
        ch = docs[0]["chains"]
        assert len(ch) == 1
        assert [m["text"] for m in ch[0]] == ["Alice", "she", "London"]

    def test_non_coref_dataset_rejected(self):
        with pytest.raises(ValueError):
            ds.parse_coref_content("x", "wikigold")


class TestRelationLoader:
    def test_docred_relations(self):
        docs = ds.parse_docred_relations(FIXTURES["docred"])
        assert len(docs) == 2
        text, rels = docs[0]["text"], docs[0]["relations"]
        assert text == "Ada Lovelace wrote for Babbage"
        r = rels[0]
        assert r["rel_type"] == "collaborator"
        assert text[r["head_start"]:r["head_end"]] == "Ada Lovelace"
        assert text[r["tail_start"]:r["tail_end"]] == "Babbage"
        assert r["head_type"] == "person" and r["tail_type"] == "person"
        assert docs[1]["relations"] == []

    def test_relation_without_ner_entry_falls_back(self):
        content = ('{"sentence": ["a", "b"], "ner": [], '
                   '"relations": [[0, 0, 1, 1, "rel"]]}\n')
        r = ds.parse_docred_relations(content)[0]["relations"][0]
        assert r["head_type"] == "ENTITY" and r["head_text"] == ""
        assert r["head_start"] == 0 and r["tail_start"] == 2


# --------------------------------------------------------------------------
# through-Spark parity (binaryFile → mapInPandas)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    (root / "conll").mkdir()
    # two files → two input tasks
    (root / "conll" / "part1.conll").write_text(FIXTURES["conll4"])
    (root / "conll" / "part2.conll").write_text(FIXTURES["conll2"])
    (root / "hf").mkdir()
    (root / "hf" / "resp.json").write_text(FIXTURES["hf_api"])
    (root / "rel").mkdir()
    (root / "rel" / "docs.jsonl").write_text(FIXTURES["docred"])
    (root / "gap").mkdir()
    (root / "gap" / "gap-test.tsv").write_text(FIXTURES["gap"])
    return root


class TestSparkReaders:
    def test_ner_reader_matches_pure_parser(self, spark, dataset_dir):
        df = ds.read_ner_dataset(spark, str(dataset_dir / "conll"),
                                 "conll2003")
        rows = df.orderBy("file", "sentence_id").collect()
        expected = (ds.parse_conll(FIXTURES["conll4"])
                    + ds.parse_conll(FIXTURES["conll2"]))
        assert len(rows) == len(expected) == 4
        by_file = {}
        for r in rows:
            by_file.setdefault(r.file, []).append(r)
        for frows, content in [
            (by_file[k], FIXTURES["conll4"] if "part1" in k
             else FIXTURES["conll2"]) for k in sorted(by_file)
        ]:
            pure = ds.parse_conll(content)
            assert len(frows) == len(pure)
            for row, sent in zip(frows, pure):
                assert row.tokens == [t for t, _ in sent]
                assert row.ner_tags == [g for _, g in sent]
                assert row.text == " ".join(row.tokens)
                pure_ents = ds.bio_entities(row.tokens, row.ner_tags)
                got = [e.asDict() for e in row.entities]
                assert got == pure_ents

    def test_ner_reader_hf_api(self, spark, dataset_dir):
        df = ds.read_ner_dataset(spark, str(dataset_dir / "hf"), "genia")
        rows = df.orderBy("sentence_id").collect()
        assert rows[0].tokens == ["Marie", "Curie", "joined", "Sorbonne"]
        assert rows[0].ner_tags == ["B-PER", "I-PER", "O", "B-ORG"]
        assert rows[0].entities[0].text == "Marie Curie"

    def test_dataset_stats(self, spark, dataset_dir):
        df = ds.read_ner_dataset(spark, str(dataset_dir / "conll"),
                                 "conll2003")
        row = ds.dataset_stats(df).collect()[0]
        assert row.sentences == 4
        assert row.tokens == 17  # conll4: 5+2, conll2: 6+4
        assert row.entities == 3 + 3
        by_type = {r.original_label: r.n
                   for r in ds.entities_by_type(df).collect()}
        assert by_type == {"ORG": 3, "MISC": 1, "PER": 2}

    def test_relation_reader(self, spark, dataset_dir):
        df = ds.read_relation_dataset(spark, str(dataset_dir / "rel"),
                                      "docred")
        rows = df.orderBy("doc_id").collect()
        assert len(rows) == 2
        assert rows[0].relations[0].rel_type == "collaborator"
        assert rows[0].relations[0].head_text == "Ada Lovelace"
        with pytest.raises(ValueError):
            ds.read_relation_dataset(spark, str(dataset_dir / "rel"),
                                     "wikigold")

    def test_coref_reader(self, spark, dataset_dir):
        df = ds.read_coref_dataset(spark, str(dataset_dir / "gap"), "gap")
        rows = df.orderBy("doc_id").collect()
        assert len(rows) == 2
        chains = rows[0].chains
        assert [m.text for m in chains[0]] == ["Alice", "she"]
        assert chains[0][1].mention_type == "pronoun"

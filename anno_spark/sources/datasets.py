"""Eval-dataset loaders — the reference's 40+ benchmark formats as a Spark source.

Port of anno/src/eval/loader.rs (4,456 LoC) + coref_loader.rs:275-400:
a registry of 64 benchmark datasets (DatasetId enum, loader.rs:84-404)
with per-dataset metadata (download URL loader.rs:409-713, display name
:713-784, category predicates :784-895, entity types :1018-1286, cache
filename :1286-1370, groupings :1370-1590, expected counts :1590-1660,
FromStr aliases :1667-1709), and the format parsers behind
``parse_content`` (loader.rs:2086-2193):

- CoNLL/BIO (space-separated, 2- or 4-column; MIT tab tag-first variant)
- HuggingFace JSONL (tokens + integer ner_tags, MultiNERD label table)
- HuggingFace datasets-server API JSON (features ClassLabel names)
- TweetNER7 JSONL (fixed 15-label table, loader.rs:2798-2880)
- DocRED/CrossRE JSON (token-span NER + relations)
- CADEC JSONL / HF-API (discontinuous spans)
- BC5CDR / NCBI-Disease BioFLAIR CoNLL (tab, 4-column)
- GAP TSV, PreCo JSONL, LitBank .ann, ECB+ CSV (coref family)

Downloading is out of scope (no network in the engine; the reference
gates it behind the ``eval-advanced`` feature too) — loaders read
already-fetched files. Spark shape: ``binaryFile`` yields one task per
file (eval corpora ship as many small files; same parallelism unit as
the WARC source), parsing runs in ``mapInPandas`` — Arrow batches of
file bytes in, sentence/doc rows out, no per-row Python UDFs.

BIO entity decode (AnnotatedSentence::entities, loader.rs:1741-1836)
is transcribed quirk-for-quirk: IOB1/IOB2 hybrid, char offsets by
space-join, E-/S- prefixes falling through to the O arm, bare tags as
implicit B. Reference quirks that would crash or mislabel are kept
(and documented inline) so parity tests can pin them.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.schema_map import TypeMapper, map_to_canonical

# --------------------------------------------------------------------------
# registry (DatasetId, loader.rs:84-1709)

_WIKIGOLD_URL = (
    "https://raw.githubusercontent.com/juand-r/entity-recognition-datasets/"
    "master/data/wikigold/CONLL-format/data/wikigold.conll.txt"
)
_CONLL03_URL = "https://raw.githubusercontent.com/autoih/conll2003/master/CoNLL-2003/eng.testb"
_CROSSRE_AI = "https://raw.githubusercontent.com/mainlp/CrossRE/main/crossre_data/ai-test.json"
_CROSSRE_NEWS = "https://raw.githubusercontent.com/mainlp/CrossRE/main/crossre_data/news-test.json"
_HF_ROWS = "https://datasets-server.huggingface.co/rows?dataset="
_GENIA_URL = _HF_ROWS + "chufangao/GENIA-NER&config=default&split=test&offset=0&length=100"
_BC2GM_URL = _HF_ROWS + "disi-unibo-nlp/bc2gm&config=default&split=test&offset=0&length=100"
_WIKIANN_URL = _HF_ROWS + "unimelb-nlp/wikiann&config=en&split=test&offset=0&length=100"
_WIKINEURAL_URL = (
    _HF_ROWS + "Babelscape/wikineural&config=default&split=test_en&offset=0&length=100"
)
_CADEC100_URL = _HF_ROWS + "KevinSpaghetti/cadec&config=default&split=test&offset=0&length=100"
_GAP_URL = (
    "https://raw.githubusercontent.com/google-research-datasets/"
    "gap-coreference/master/gap-test.tsv"
)

_PLOM = ("PER", "LOC", "ORG", "MISC")


@dataclass(frozen=True)
class DatasetInfo:
    """One DatasetId row: metadata the reference exposes as enum methods."""

    key: str
    name: str                      # loader.rs:713-784
    url: str                       # loader.rs:409-713
    cache_filename: str            # loader.rs:1286-1370
    format: str                    # parse_content dispatch, loader.rs:2086-2193
    entity_types: tuple            # loader.rs:1018-1286
    expected_entities: tuple       # (min, max), loader.rs:1590-1660
    categories: frozenset = field(default_factory=frozenset)
    type_mapper: str | None = None  # TypeMapper preset, loader.rs:895-921


def _d(key, name, url, cache, fmt, types, counts, cats=(), mapper=None):
    return DatasetInfo(key, name, url, cache, fmt, tuple(types), counts,
                       frozenset(cats), mapper)


# Order matches DatasetId::all() (loader.rs:1370-1455).
_REGISTRY = [
    _d("wikigold", "WikiGold", _WIKIGOLD_URL, "wikigold.conll", "conll",
       _PLOM, (1000, 5000), {"ner"}),
    _d("wnut17", "WNUT-17",
       "https://raw.githubusercontent.com/leondz/emerging_entities_17/master/wnut17test.conll",
       "wnut17.conll", "conll",
       ("person", "location", "corporation", "product", "creative-work", "group"),
       (500, 5000), {"ner", "social_media"}),
    _d("mit_movie", "MIT Movie",
       "https://groups.csail.mit.edu/sls/downloads/movie/engtest.bio",
       "mit_movie.bio", "mit",
       ("Actor", "Director", "Genre", "Title", "Year", "Song", "Character",
        "Plot", "Rating"),
       (1000, 15000), {"ner", "specialized"}, "mit_movie"),
    _d("mit_restaurant", "MIT Restaurant",
       "https://groups.csail.mit.edu/sls/downloads/restaurant/restauranttest.bio",
       "mit_restaurant.bio", "mit",
       ("Amenity", "Cuisine", "Dish", "Hours", "Location", "Price", "Rating",
        "Restaurant_Name"),
       (1000, 15000), {"ner", "specialized"}, "mit_restaurant"),
    _d("conll2003", "CoNLL-2003 Sample", _CONLL03_URL, "conll2003_sample.conll",
       "conll", _PLOM, (5000, 30000), {"ner"}),
    _d("ontonotes", "OntoNotes Sample", _CONLL03_URL, "ontonotes_sample.conll",
       "conll",
       ("PERSON", "ORG", "GPE", "LOC", "DATE", "TIME", "MONEY", "PERCENT",
        "NORP", "FAC", "PRODUCT", "EVENT", "WORK_OF_ART", "LAW", "LANGUAGE",
        "QUANTITY", "ORDINAL", "CARDINAL"),
       (5000, 50000), {"ner"}),
    _d("multinerd", "MultiNERD",
       "https://huggingface.co/datasets/Babelscape/multinerd/resolve/main/test/test_en.jsonl",
       "multinerd_en.jsonl", "jsonl_ner",
       ("PER", "LOC", "ORG", "ANIM", "BIO", "CEL", "DIS", "EVE", "FOOD",
        "INST", "MEDIA", "MYTH", "PLANT", "TIME", "VEHI"),
       (50000, 200000), {"ner", "multilingual"}),
    _d("bc5cdr", "BC5CDR",
       "https://raw.githubusercontent.com/shreyashub/BioFLAIR/master/data/ner/bc5cdr/test.txt",
       "bc5cdr.xml", "bc5cdr", ("Chemical", "Disease"), (10000, 50000),
       {"ner", "biomedical"}, "biomedical"),
    _d("ncbi_disease", "NCBI Disease",
       "https://raw.githubusercontent.com/shreyashub/BioFLAIR/master/data/ner/NCBI-disease/test.txt",
       "ncbi_disease.txt", "ncbi", ("Disease",), (2000, 10000),
       {"ner", "biomedical"}, "biomedical"),
    _d("genia", "GENIA", _GENIA_URL, "genia_ner.conll", "hf_api",
       ("DNA", "RNA", "protein", "cell_line", "cell_type"), (20000, 100000),
       {"ner", "biomedical"}, "biomedical"),
    _d("anatem", "AnatEM",
       _HF_ROWS + "disi-unibo-nlp/AnatEM&config=default&split=test&offset=0&length=100",
       "anatom_ner.conll", "hf_api",
       ("Anatomical_system", "Cancer", "Cell", "Cellular_component",
        "Developing_anatomical_structure", "Immaterial_anatomical_entity",
        "Multi-tissue_structure", "Organ", "Organism_subdivision",
        "Organism_substance", "Pathological_formation", "Tissue"),
       (5000, 20000), {"ner", "biomedical"}, "biomedical"),
    _d("bc2gm", "BC2GM", _BC2GM_URL, "bc2gm.conll", "hf_api", ("GENE",),
       (10000, 50000), {"ner", "biomedical"}, "biomedical"),
    _d("bc4chemd", "BC4CHEMD",
       _HF_ROWS + "disi-unibo-nlp/bc4chemd&config=default&split=test&offset=0&length=100",
       "bc4chemd.conll", "hf_api", ("Chemical",), (10000, 50000),
       {"ner", "biomedical"}, "biomedical"),
    _d("tweetner7", "TweetNER7",
       "https://huggingface.co/datasets/tner/tweetner7/resolve/main/dataset/2020.dev.json",
       "tweetner7.conll", "tweetner7",
       ("corporation", "creative_work", "event", "group", "location",
        "person", "product"),
       (10000, 50000), {"ner", "social_media"}, "social_media"),
    _d("broad_twitter", "BroadTwitterCorpus",
       "https://huggingface.co/datasets/GateNLP/broad_twitter_corpus/resolve/main/test/a.conll",
       "broad_twitter.conll", "conll", ("PER", "LOC", "ORG"), (5000, 20000),
       {"ner", "social_media"}),
    _d("fabner", "FabNER",
       _HF_ROWS + "DFKI-SLT/fabner&config=fabner&split=test&offset=0&length=100",
       "fabner.conll", "hf_api",
       ("MATE", "MANP", "MACEQ", "APPL", "FEAT", "PARA", "PRO", "CHAR",
        "ENAT", "CONPRI", "BIOP", "MANS"),
       (10000, 50000), {"ner", "specialized"}, "manufacturing"),
    _d("fewnerd", "Few-NERD",
       _HF_ROWS + "DFKI-SLT/few-nerd&config=supervised&split=test&offset=0&length=100",
       "fewnerd_dev.txt", "hf_api",
       ("person", "organization", "location", "building", "art", "product",
        "event", "other"),
       (50000, 200000), {"ner", "few_shot"}),
    _d("crossner", "CrossNER",
       _HF_ROWS + "DFKI-SLT/cross_ner&config=ai&split=test&offset=0&length=100",
       "crossner_politics.txt", "hf_api",
       ("politician", "election", "political_party", "country", "location",
        "organization", "person", "misc"),
       (5000, 20000), {"ner", "few_shot"}),
    _d("universalner_bench", "UniversalNER Bench",
       "https://groups.csail.mit.edu/sls/downloads/movie/trivia10k13test.bio",
       "universalner_bench.json", "conll",
       ("Actor", "Director", "Character", "Title", "Year", "Genre", "Song",
        "Plot"),
       (1000, 10000), {"ner", "few_shot"}),
    _d("wikiann", "WikiANN", _WIKIANN_URL, "wikiann_en.jsonl", "hf_api",
       ("PER", "LOC", "ORG"), (100000, 500000), {"ner", "multilingual"}),
    _d("multiconer", "MultiCoNER",
       _HF_ROWS + "DFKI-SLT/few-nerd&config=supervised&split=test&offset=0&length=100",
       "multiconer_en.conll", "hf_api",
       ("PER", "LOC", "GRP", "CORP", "PROD", "CW"), (50000, 200000),
       {"ner", "multilingual"}),
    _d("multiconer_v2", "MultiCoNER v2",
       _HF_ROWS + "DFKI-SLT/cross_ner&config=politics&split=test&offset=0&length=100",
       "multiconer2_en.conll", "hf_api",
       ("Scientist", "Artist", "Athlete", "Politician", "Cleric",
        "SportsManager", "OtherPER", "Facility", "OtherLOC",
        "HumanSettlement", "Station", "VisualWork", "MusicalWork",
        "WrittenWork", "ArtWork", "Software", "OtherCW", "MusicalGRP",
        "PublicCorp", "PrivateCorp", "AerospaceManufacturer", "SportsGRP",
        "CarManufacturer", "TechCORP", "ORG", "Clothing", "Vehicle", "Food",
        "Drink", "OtherPROD", "Medication/Vaccine", "MedicalProcedure",
        "AnatomicalStructure", "Symptom", "Disease"),
       (50000, 200000), {"ner", "multilingual"}),
    _d("wikineural", "WikiNeural", _WIKINEURAL_URL, "wikineural_en.conll",
       "hf_api", _PLOM, (50000, 200000), {"ner", "multilingual"}),
    _d("polyglot_ner", "PolyglotNER", _WIKIANN_URL, "polyglot_en.conll",
       "hf_api", ("PER", "LOC", "ORG"), (100000, 500000),
       {"ner", "multilingual"}),
    _d("universal_ner", "UniversalNER", _WIKINEURAL_URL,
       "universalner_en.conllu", "hf_api", ("PER", "LOC", "ORG"),
       (5000, 30000), {"ner", "multilingual"}),
    _d("uner", "UNER",
       _HF_ROWS + "universalner/universal_ner&config=en&split=test&offset=0&length=100",
       "uner.json", "hf_api", ("PER", "LOC", "ORG"), (10000, 50000),
       {"ner", "multilingual"}),
    _d("msner", "MSNER",
       _HF_ROWS + "facebook/voxpopuli&config=nl&split=test&offset=0&length=100",
       "msner.json", "hf_api", ("PER", "LOC", "ORG"), (50000, 200000),
       {"ner", "multilingual"}),
    _d("biomner", "BioMNER",
       _HF_ROWS + "tner/bionlp2004&config=default&split=test&offset=0&length=100",
       "biomner.json", "hf_api", ("Method", "Material", "Metric"),
       (5000, 20000), {"ner"}),
    _d("legner", "LegNER", _WIKIGOLD_URL, "legner.conll", "conll",
       ("PERSON", "ORGANIZATION", "LAW", "CASE_REFERENCE", "COURT"),
       (10000, 50000), {"ner"}),
    # relation extraction (all parse the CrossRE JSON shape)
    _d("docred", "DocRED", _CROSSRE_AI, "docred_dev.json", "docred",
       ("PER", "ORG", "LOC", "TIME", "NUM", "MISC"), (50000, 150000),
       {"relation"}),
    _d("retacred", "Re-TACRED", _CROSSRE_NEWS, "retacred_dev.json", "docred",
       ("per:title", "org:top_members/employees", "per:employee_of",
        "org:country_of_headquarters", "per:countries_of_residence",
        "per:cities_of_residence", "per:origin", "org:alternate_names",
        "org:member_of", "org:members", "org:subsidiaries", "org:parents",
        "org:founded_by", "org:founded", "org:dissolved",
        "org:number_of_employees/members",
        "org:political/religious_affiliation"),
       (100000, 150000), {"relation"}),
    _d("nytfb", "NYT-FB", _CROSSRE_NEWS, "nytfb_dev.json", "docred",
       ("per:employee_of", "org:founded_by", "per:title",
        "org:top_members/employees"),
       (50000, 100000), {"relation"}),
    _d("webnlg", "WEBNLG", _CROSSRE_AI, "webnlg_dev.json", "docred",
       ("birthPlace", "birthDate", "deathPlace", "foundationPlace",
        "foundationDate"),
       (10000, 50000), {"relation"}),
    _d("google_re", "Google-RE", _CROSSRE_NEWS, "googlere_dev.json", "docred",
       ("birth_place", "birth_date", "place_of_death", "place_lived"),
       (5000, 20000), {"relation"}),
    _d("biored", "BioRED", _CROSSRE_AI, "biored_dev.json", "docred",
       ("gene-protein", "disease-chemical", "gene-disease",
        "protein-disease"),
       (10000, 50000), {"relation"}),
    _d("scier", "SciER",
       "https://raw.githubusercontent.com/edzq/SciER/main/data/train.json",
       "scier.json", "docred", ("Method", "Task", "Material"),
       (20000, 50000), {"relation"}),
    _d("mixred", "MixRED", _CROSSRE_NEWS, "mixred.json", "docred",
       ("PER", "ORG", "LOC"), (5000, 20000), {"relation", "multilingual"}),
    _d("covered", "CovEReD", _CROSSRE_AI, "covered.json", "docred",
       _PLOM, (50000, 150000), {"relation"}),
    # discontinuous NER
    _d("cadec", "CADEC", _HF_ROWS + "KevinSpaghetti/cadec&config=default&split=test&offset=0&length=1000",
       "cadec_test.jsonl", "cadec",
       ("adverse_drug_event", "drug", "disease", "symptom"), (10000, 30000),
       {"ner", "discontinuous"}),
    _d("share13", "ShARe 2013", _CADEC100_URL, "share13.jsonl", "cadec",
       ("Disorder",), (5000, 15000), {"ner"}),
    _d("share14", "ShARe 2014", _CADEC100_URL, "share14.jsonl", "cadec",
       ("Disorder",), (30000, 100000), {"ner"}),
    # coreference
    _d("gap", "GAP", _GAP_URL, "gap_dev.tsv", "gap", ("PERSON",),
       (4000, 10000), {"coref"}),
    _d("preco", "PreCo",
       "https://huggingface.co/datasets/coref-data/preco/resolve/main/data/test.jsonl",
       "preco_dev.json", "preco_jsonl", ("MENTION",), (100000, 500000),
       {"coref"}),
    _d("litbank", "LitBank",
       "https://raw.githubusercontent.com/dbamman/litbank/master/coref/brat/1023_bleak_house_brat.ann",
       "litbank_coref.zip", "litbank", ("PER", "LOC", "ORG", "GPE", "FAC",
                                        "VEH"),
       (5000, 30000), {"coref"}),
    _d("ecb_plus", "ECB+",
       "https://raw.githubusercontent.com/cltl/ecbPlus/master/ECB%2B/ECB%2B_coreference_sentences.csv",
       "ecbplus.csv", "ecb_plus", ("Event",), (10000, 50000), {"coref"}),
    _d("wikicoref", "WikiCoref", _GAP_URL, "wikicoref.tsv", "gap",
       ("PER", "LOC", "ORG"), (5000, 20000), {"coref"}),
    # event extraction
    _d("ace2005", "ACE 2005", _CROSSRE_AI, "ace2005.json", "docred",
       ("PER", "ORG", "GPE", "LOC", "FAC", "VEH", "WEA"), (20000, 100000),
       {"event"}),
    # entity linking / NED
    _d("aida", "AIDA", _WIKIGOLD_URL, "aida.conll", "conll", _PLOM,
       (50000, 200000), {"linking"}),
    _d("tackbp", "TAC-KBP", _WIKIGOLD_URL, "tackbp.json", "conll", _PLOM,
       (50000, 200000), {"linking"}),
    # additional NER
    _d("conll2002", "CoNLL-2002", _CONLL03_URL, "conll2002.conll", "conll",
       _PLOM, (10000, 50000), {"ner"}),
    _d("conll2002_es", "CoNLL-2002 (Spanish)", _CONLL03_URL,
       "conll2002_es.conll", "conll", _PLOM, (10000, 50000), {"ner"}),
    _d("conll2002_nl", "CoNLL-2002 (Dutch)", _CONLL03_URL,
       "conll2002_nl.conll", "conll", _PLOM, (10000, 50000), {"ner"}),
    _d("ontonotes50", "OntoNotes 5.0", _CONLL03_URL, "ontonotes50.conll",
       "conll", _PLOM, (100000, 500000), {"ner"}),
    _d("germeval2014", "GermEval 2014", _CONLL03_URL, "germeval2014.conll",
       "conll", _PLOM, (20000, 100000), {"ner"}),
    _d("harem", "HAREM", _CONLL03_URL, "harem.conll", "conll", _PLOM,
       (100000, 500000), {"ner"}),
    _d("semeval2013_task91", "SemEval-2013 Task 9.1", _CONLL03_URL,
       "semeval2013_task91.conll", "conll", _PLOM, (5000, 20000), {"ner"}),
    _d("muc6", "MUC-6", _CONLL03_URL, "muc6.conll", "conll", _PLOM,
       (10000, 50000), {"ner"}),
    _d("muc7", "MUC-7", _CONLL03_URL, "muc7.conll", "conll", _PLOM,
       (10000, 50000), {"ner"}),
    # additional biomedical (NOT in is_biomedical() — transcribed quirk)
    _d("jnlpba", "JNLPBA", _GENIA_URL, "jnlpba.conll", "conll",
       ("DNA", "RNA", "protein", "cell_line", "cell_type"), (15000, 80000),
       {"ner"}),
    _d("bc2gm_full", "BC2GM (Full)", _BC2GM_URL, "bc2gm_full.conll", "conll",
       ("GENE",), (20000, 100000), {"ner"}),
    _d("craft", "CRAFT", _GENIA_URL, "craft.conll", "conll",
       ("CHEBI", "CL", "GO_BP", "GO_CC", "GO_MF", "MOP", "NCBITaxon", "PR",
        "SO", "UBERON"),
       (50000, 200000), {"ner"}),
    # additional domain-specific
    _d("finner", "FinNER", _WIKIGOLD_URL, "finner.conll", "conll",
       ("Company", "Currency", "FinancialInstrument"), (5000, 20000),
       {"ner"}),
    _d("legalner", "LegalNER", _WIKIGOLD_URL, "legalner.conll", "conll",
       ("PERSON", "ORGANIZATION", "LAW", "CASE_REFERENCE"), (10000, 50000),
       {"ner"}),
    _d("scierc_ner", "SciERC NER", _CROSSRE_AI, "scierc_ner.json", "docred",
       ("Method", "Task", "Dataset", "Metric", "Material",
        "OtherScientificTerm"),
       (20000, 100000), {"ner"}),
]

DATASETS: dict[str, DatasetInfo] = {d.key: d for d in _REGISTRY}

# FromStr aliases (loader.rs:1667-1709) — lowercase input → canonical key.
ALIASES = {
    "wikigold": "wikigold", "wiki_gold": "wikigold", "wiki-gold": "wikigold",
    "wnut17": "wnut17", "wnut-17": "wnut17", "wnut_17": "wnut17",
    "mitmovie": "mit_movie", "mit_movie": "mit_movie", "mit-movie": "mit_movie",
    "mitrestaurant": "mit_restaurant", "mit_restaurant": "mit_restaurant",
    "mit-restaurant": "mit_restaurant",
    "conll2003": "conll2003", "conll-2003": "conll2003",
    "conll2003sample": "conll2003",
    "ontonotes": "ontonotes", "ontonotes5": "ontonotes",
    "ontonotessample": "ontonotes",
    "multinerd": "multinerd", "multi_nerd": "multinerd",
    "multi-nerd": "multinerd",
    "bc5cdr": "bc5cdr", "bc5-cdr": "bc5cdr", "biocreative": "bc5cdr",
    "ncbidisease": "ncbi_disease", "ncbi_disease": "ncbi_disease",
    "ncbi-disease": "ncbi_disease", "ncbi": "ncbi_disease",
    "fewnerd": "fewnerd", "few_nerd": "fewnerd", "few-nerd": "fewnerd",
    "crossner": "crossner", "cross_ner": "crossner", "cross-ner": "crossner",
    "universalner": "universalner_bench",
    "universalnerbench": "universalner_bench",
    "universal_ner": "universalner_bench",
    "wikiann": "wikiann", "wiki_ann": "wikiann", "wiki-ann": "wikiann",
    "panx": "wikiann", "pan-x": "wikiann",
    "multiconer": "multiconer", "multi_coner": "multiconer",
    "multi-coner": "multiconer",
    "multiconerv2": "multiconer_v2", "multiconer2": "multiconer_v2",
    "multiconer_v2": "multiconer_v2",
    "docred": "docred", "doc_red": "docred", "doc-red": "docred",
    "retacred": "retacred", "re_tacred": "retacred", "re-tacred": "retacred",
    "tacred": "retacred",
    "gap": "gap", "gap-coreference": "gap", "gapcoreference": "gap",
    "preco": "preco", "pre-co": "preco", "pre_co": "preco",
    "litbank": "litbank", "lit_bank": "litbank", "lit-bank": "litbank",
    "literary": "litbank",
}


def dataset_from_str(s: str) -> DatasetInfo:
    """FromStr (loader.rs:1667-1709): lowercase alias lookup."""
    key = ALIASES.get(s.lower())
    if key is None:
        raise ValueError(f"Unknown dataset: {s}")
    return DATASETS[key]


def all_datasets() -> list[str]:
    return [d.key for d in _REGISTRY]


def quick_datasets() -> list[str]:
    """CI smoke subset (loader.rs:1462-1472)."""
    return ["wikigold", "mit_movie", "gap"]


def medium_datasets() -> list[str]:
    """Development subset (loader.rs:1474-1486)."""
    return ["wikigold", "wnut17", "mit_movie", "mit_restaurant", "conll2003",
            "gap"]


def datasets_in_category(cat: str) -> list[str]:
    return [d.key for d in _REGISTRY if cat in d.categories]


def all_ner_datasets() -> list[str]:
    """loader.rs:1487-1524 — standard+bio+social+specialized+few-shot+multi."""
    return ["wikigold", "wnut17", "mit_movie", "mit_restaurant", "conll2003",
            "ontonotes", "multinerd", "bc5cdr", "ncbi_disease", "genia",
            "anatem", "bc2gm", "bc4chemd", "tweetner7", "broad_twitter",
            "fabner", "fewnerd", "crossner", "universalner_bench", "wikiann",
            "multiconer", "multiconer_v2", "wikineural", "polyglot_ner",
            "universal_ner"]


def temporal_metadata(key: str) -> dict | None:
    """get_temporal_metadata (loader.rs:2050-2084)."""
    if key == "tweetner7":
        return {"kb_version": None, "temporal_cutoff": "2017-01-01",
                "entity_creation_dates": None}
    if key == "broad_twitter":
        return {"kb_version": None, "temporal_cutoff": "2018-01-01",
                "entity_creation_dates": None}
    if key in ("bc5cdr", "ncbi_disease", "genia", "anatem", "bc2gm",
               "bc4chemd"):
        return {"kb_version": "UMLS-2023", "temporal_cutoff": None,
                "entity_creation_dates": None}
    return None


def type_mapper_for(key: str) -> TypeMapper | None:
    """type_mapper() (loader.rs:895-921) — preset per dataset family."""
    preset = DATASETS[key].type_mapper
    if preset is None:
        return None
    return getattr(TypeMapper, preset)()


# --------------------------------------------------------------------------
# BIO decode (parse_bio_tag loader.rs:4195-4208;
#             AnnotatedSentence::entities loader.rs:1741-1836)


def parse_bio_tag(tag: str) -> tuple:
    if tag == "O":
        return ("O", "")
    if "-" in tag:
        i = tag.index("-")
        return (tag[:i], tag[i + 1:])
    # No prefix: implicit B with the whole tag as the type (so a bare
    # "I" becomes ("B", "I") — reference behavior).
    return ("B", tag)


def bio_entities(tokens: list, tags: list) -> list:
    """Gold entities from BIO/IOB tags with char offsets (space-join).

    IOB1/IOB2 hybrid per loader.rs:1741-1836: B always starts; I starts a
    new entity when there is no open entity, the open entity's type
    differs, or the *previous tag's* type differs (IOB1 restart); any
    other prefix (O, and also E-/S- — the reference's match arm is
    B/I/_) closes the open entity and resets the previous-type memory.
    """
    entities = []
    cur = None           # (etype, start, words)
    off = 0
    prev_type = None

    def flush():
        if cur is not None:
            text = " ".join(cur[2])
            entities.append({
                "text": text,
                "entity_type": map_to_canonical(cur[0], None),
                "original_label": cur[0],
                "start": cur[1],
                "end": cur[1] + len(text),
            })

    for tok, tag in zip(tokens, tags):
        prefix, etype = parse_bio_tag(tag)
        if prefix == "B":
            flush()
            cur = (etype, off, [tok])
            prev_type = etype
        elif prefix == "I":
            if cur is None or prev_type is None:
                start_new = True
            else:
                start_new = cur[0] != etype or prev_type != etype
            if start_new:
                flush()
                cur = (etype, off, [tok])
            else:
                cur[2].append(tok)
            prev_type = etype
        else:
            flush()
            cur = None
            prev_type = None
        off += len(tok) + 1

    flush()
    return entities


# --------------------------------------------------------------------------
# pure format parsers — content → list of sentences [(token, tag), ...]

# MultiNERD integer-tag table (loader.rs:2611-2617).
MULTINERD_TAGS = [
    "O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC", "B-ANIM",
    "I-ANIM", "B-BIO", "I-BIO", "B-CEL", "I-CEL", "B-DIS", "I-DIS", "B-EVE",
    "I-EVE", "B-FOOD", "I-FOOD", "B-INST", "I-INST", "B-MEDIA", "I-MEDIA",
    "B-MYTH", "I-MYTH", "B-PLANT", "I-PLANT", "B-TIME", "I-TIME", "B-VEHI",
    "I-VEHI",
]

# TweetNER7 label.json index order (loader.rs:2798-2826).
TWEETNER7_TAGS = [
    "B-corporation", "B-creative_work", "B-event", "B-group", "B-location",
    "B-person", "B-product", "I-corporation", "I-creative_work", "I-event",
    "I-group", "I-location", "I-person", "I-product", "O",
]

# CADEC ner_tags fallback table (loader.rs:3290-3307).
CADEC_TAGS = [
    "O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC", "B-MISC",
    "I-MISC", "B-DRUG", "I-DRUG", "B-ADR", "I-ADR", "B-DISEASE", "I-DISEASE",
]


def parse_conll(content: str, mit: bool = False) -> list:
    """CoNLL/BIO (loader.rs:2528-2602). 2-col word+tag, 4-col CoNLL-2003
    (word POS chunk NER), single-col → O; MIT variant is TAB tag-first."""
    sentences = []
    cur = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            if cur:
                sentences.append(cur)
                cur = []
            continue
        if line.startswith("-DOCSTART-"):
            continue
        if mit:
            parts = line.split("\t")
            if len(parts) >= 2:
                cur.append((parts[1], parts[0]))
            continue
        parts = line.split()
        if not parts:
            continue
        if len(parts) >= 4:
            cur.append((parts[0], parts[3]))
        elif len(parts) >= 2:
            cur.append((parts[0], parts[-1]))
        else:
            cur.append((parts[0], "O"))
    if cur:
        sentences.append(cur)
    return sentences


def parse_jsonl_ner(content: str, tag_table: list = MULTINERD_TAGS) -> list:
    """HF JSONL: {"tokens": [...], "ner_tags": [ints]} (loader.rs:2607-2674)."""
    sentences = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        tokens = obj.get("tokens")
        tags = obj.get("ner_tags")
        if not isinstance(tokens, list) or not isinstance(tags, list):
            continue
        if len(tokens) != len(tags):
            continue
        sent = []
        for tok, tag in zip(tokens, tags):
            text = tok if isinstance(tok, str) else ""
            idx = tag if isinstance(tag, int) and not isinstance(tag, bool) else 0
            ner = tag_table[idx] if 0 <= idx < len(tag_table) else "O"
            sent.append((text, ner))
        if sent:
            sentences.append(sent)
    return sentences


def parse_tweetner7(content: str) -> list:
    """TweetNER7 JSONL with "tags" ints (loader.rs:2798-2880)."""
    sentences = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        tokens = obj.get("tokens")
        tags = obj.get("tags")
        if not isinstance(tokens, list) or not isinstance(tags, list):
            continue
        if len(tokens) != len(tags):
            continue
        sent = []
        for tok, tag in zip(tokens, tags):
            text = tok if isinstance(tok, str) else ""
            idx = tag if isinstance(tag, int) and not isinstance(tag, bool) else 0
            ner = TWEETNER7_TAGS[idx] if 0 <= idx < len(TWEETNER7_TAGS) else "O"
            sent.append((text, ner))
        if sent:
            sentences.append(sent)
    return sentences


def is_hf_api_response(content: str) -> bool:
    """loader.rs:2782-2795 — exact prefix/substring checks (no whitespace
    tolerance inside the JSON; transcribed)."""
    t = content.lstrip()
    return (t.startswith('{"rows":') or t.startswith('{"features":')
            or (t.startswith("{") and '"rows":[' in t and '"features":[' in t))


def hf_tag_names(parsed: dict) -> list:
    """ClassLabel names from features[name=ner_tags] (loader.rs:2745-2780)."""
    feats = parsed.get("features")
    if isinstance(feats, list):
        for feature in feats:
            if isinstance(feature, dict) and feature.get("name") == "ner_tags":
                names = (feature.get("type", {}) or {}).get("feature", {})
                names = (names or {}).get("names")
                if isinstance(names, list):
                    return [n for n in names if isinstance(n, str)]
                break
    return []


def parse_hf_api(content: str) -> list:
    """HF datasets-server rows response (loader.rs:2679-2744)."""
    parsed = json.loads(content)
    tag_names = hf_tag_names(parsed)
    rows = parsed.get("rows")
    if not isinstance(rows, list):
        raise ValueError("No 'rows' array in HF API response")
    sentences = []
    for row_obj in rows:
        row = row_obj.get("row") if isinstance(row_obj, dict) else None
        if not isinstance(row, dict):
            continue
        tokens = row.get("tokens")
        tags = row.get("ner_tags")
        if not isinstance(tokens, list) or not isinstance(tags, list):
            continue
        if len(tokens) != len(tags):
            continue
        sent = []
        for tok, tag in zip(tokens, tags):
            text = tok if isinstance(tok, str) else ""
            if isinstance(tag, bool):
                ner = "O"
            elif isinstance(tag, int):
                ner = tag_names[tag] if 0 <= tag < len(tag_names) else f"TAG_{tag}"
            elif isinstance(tag, str):
                ner = tag
            else:
                ner = "O"
            sent.append((text, ner))
        if sent:
            sentences.append(sent)
    return sentences


def parse_docred_ner(content: str) -> list:
    """CrossRE JSONL NER view: sentence tokens + [start,end,type] spans
    (inclusive end), BIO-projected (loader.rs:2992-3066)."""
    sentences = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            doc = json.loads(line)
        except ValueError:
            continue
        toks = doc.get("sentence")
        if not isinstance(toks, list):
            continue
        words = [t for t in toks if isinstance(t, str)]
        tags = ["O"] * len(words)
        ner = doc.get("ner")
        if isinstance(ner, list):
            for span in ner:
                if isinstance(span, list) and len(span) >= 3:
                    start = span[0] if isinstance(span[0], int) else 0
                    end = span[1] if isinstance(span[1], int) else 0
                    etype = span[2] if isinstance(span[2], str) else "ENTITY"
                    for idx in range(start, end + 1):
                        if 0 <= idx < len(words):
                            tags[idx] = (f"B-{etype.upper()}" if idx == start
                                         else f"I-{etype.upper()}")
        if words:
            sentences.append(list(zip(words, tags)))
    return sentences


def parse_bc5cdr(content: str) -> list:
    """BioFLAIR BC5CDR tab CoNLL; Entity/CHEMICAL/DISEASE tags all collapse
    to CHEMICAL (loader.rs:3355-3427 — transcribed quirk)."""
    sentences = []
    cur = []
    for line in content.splitlines():
        line = line.strip()
        if line.startswith("-DOCSTART-"):
            continue
        if not line:
            if cur:
                sentences.append(cur)
                cur = []
            continue
        parts = line.split("\t")
        if len(parts) >= 4:
            word, tag = parts[0], parts[3]
            if "Entity" in tag or "CHEMICAL" in tag or "DISEASE" in tag:
                if tag.startswith("B-"):
                    tag = "B-CHEMICAL"
                elif tag.startswith("I-"):
                    tag = "I-CHEMICAL"
                else:
                    tag = "O"
            cur.append((word, tag))
    if cur:
        sentences.append(cur)
    return sentences


def parse_ncbi_disease(content: str) -> list:
    """BioFLAIR NCBI-Disease tab CoNLL, tags kept (loader.rs:3432-3479)."""
    sentences = []
    cur = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            if cur:
                sentences.append(cur)
                cur = []
            continue
        parts = line.split("\t")
        if len(parts) >= 4:
            cur.append((parts[0], parts[3]))
    if cur:
        sentences.append(cur)
    return sentences


def parse_gap_ner(content: str) -> list:
    """GAP TSV NER view: whitespace tokens, all O (loader.rs:3484-3527)."""
    sentences = []
    for i, line in enumerate(content.splitlines()):
        if i == 0:
            continue
        parts = line.split("\t")
        if len(parts) < 10:
            continue
        toks = parts[1].split()
        if toks:
            sentences.append([(w, "O") for w in toks])
    return sentences


def parse_preco_ner(content: str) -> list:
    """PreCo JSONL NER view: token arrays, all O (loader.rs:3532-3580)."""
    sentences = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        sents = obj.get("sentences")
        if isinstance(sents, list):
            for sent_tokens in sents:
                if isinstance(sent_tokens, list):
                    toks = [t for t in sent_tokens if isinstance(t, str)]
                    if toks:
                        sentences.append([(t, "O") for t in toks])
    return sentences


def parse_litbank_ner(content: str) -> list:
    """LitBank .ann NER view: every T-line mention becomes one token tagged
    B-<label>, all in a single sentence (loader.rs:3631-3673)."""
    ents = []
    for line in content.splitlines():
        if line.startswith("T"):
            parts = line.split("\t")
            if len(parts) >= 3:
                type_span = parts[1].split()
                if len(type_span) >= 3:
                    ents.append((parts[2], f"B-{type_span[0]}"))
    return [ents] if ents else []


def parse_ecb_plus(content: str) -> list:
    """ECB+ CSV: text column tokenized, all O (loader.rs:3678-3722)."""
    sentences = []
    for i, line in enumerate(content.splitlines()):
        if i == 0:
            continue
        parts = line.split(",")
        if len(parts) < 3:
            continue
        toks = parts[1].split()
        if toks:
            sentences.append([(w, "O") for w in toks])
    return sentences


def parse_cadec_jsonl(content: str) -> list:
    """CADEC JSONL with discontinuous-span support (loader.rs:3177-3338).

    Char offsets are the space-join convention; entities carry either
    "spans" [[s,e],...] (discontinuous) or "start"/"end". A span
    touching token 0 is tagged B (the reference's previous-token check
    underflows there — guarded here, same visible output for inputs the
    reference survives). Falls back to integer "ner_tags" with the
    CADEC 15-label table.
    """
    sentences = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        tokens = obj.get("tokens")
        if not isinstance(tokens, list):
            continue
        texts = [t if isinstance(t, str) else "" for t in tokens]
        offsets = []
        off = 0
        for t in texts:
            start = off
            off += len(t) + 1
            offsets.append((start, off - 1))
        tags = ["O"] * len(texts)

        def mark(start, end, label):
            for idx, (ts, te) in enumerate(offsets):
                if ts >= start and te <= end:
                    prev = tags[idx - 1] if idx > 0 else ""
                    if prev.startswith(f"I-{label}") or prev.startswith(f"B-{label}"):
                        tags[idx] = f"I-{label}"
                    else:
                        tags[idx] = f"B-{label}"

        entities = obj.get("entities")
        if isinstance(entities, list):
            for ent in entities:
                if not isinstance(ent, dict):
                    continue
                label = ent.get("label") or ent.get("entity_type") or "UNKNOWN"
                if not isinstance(label, str):
                    label = "UNKNOWN"
                spans = ent.get("spans")
                if isinstance(spans, list):
                    for span in spans:
                        if isinstance(span, list) and len(span) >= 2:
                            mark(int(span[0]), int(span[1]), label)
                elif isinstance(ent.get("start"), int) and isinstance(ent.get("end"), int):
                    mark(ent["start"], ent["end"], label)
        else:
            ner_tags = obj.get("ner_tags")
            if isinstance(ner_tags, list):
                for idx in range(len(texts)):
                    if idx < len(ner_tags):
                        ti = ner_tags[idx]
                        ti = ti if isinstance(ti, int) and not isinstance(ti, bool) else 0
                        tags[idx] = CADEC_TAGS[ti] if 0 <= ti < len(CADEC_TAGS) else "O"
        if texts:
            sentences.append(list(zip(texts, tags)))
    return sentences


def parse_cadec_hf_api(content: str) -> list:
    """CADEC HF-API rows: {"text", "ade"} pairs; the ADE substring is
    located case-insensitively and overlapping words tagged
    B-adverse_drug_event (loader.rs:3072-3172). The reference's B/I
    choice re-checks ``!last.starts_with("I-")`` so consecutive ADE
    words each restart as B — transcribed faithfully."""
    parsed = json.loads(content)
    rows = parsed.get("rows")
    if not isinstance(rows, list):
        raise ValueError("No 'rows' array in CADEC HF API response")
    sentences = []
    for row_obj in rows:
        row = row_obj.get("row") if isinstance(row_obj, dict) else None
        if not isinstance(row, dict):
            continue
        text = row.get("text")
        ade = row.get("ade")
        if not isinstance(text, str) or not isinstance(ade, str):
            continue
        pos = text.lower().find(ade.lower())
        if pos < 0:
            continue
        ade_start, ade_end = pos, pos + len(ade)
        sent = []
        char_idx = 0
        for word in text.split():
            found = text[char_idx:].find(word)
            word_start = (found if found >= 0 else 0) + char_idx
            word_end = word_start + len(word)
            if word_start >= ade_start and word_end <= ade_end:
                if (word_start == ade_start or not sent
                        or not sent[-1][1].startswith("I-")):
                    tag = "B-adverse_drug_event"
                else:
                    tag = "I-adverse_drug_event"
            else:
                tag = "O"
            sent.append((word, tag))
            char_idx = word_end
            if char_idx < len(text) and text[char_idx] == " ":
                char_idx += 1
        if sent:
            sentences.append(sent)
    return sentences


def parse_ner_content(content: str, key: str) -> list:
    """parse_content dispatch (loader.rs:2086-2193): HF-API auto-detect
    first, then the per-dataset format parser."""
    info = DATASETS[key]
    if is_hf_api_response(content):
        if info.format == "cadec":
            return parse_cadec_hf_api(content)
        return parse_hf_api(content)
    fmt = info.format
    if fmt == "conll":
        return parse_conll(content)
    if fmt == "mit":
        return parse_conll(content, mit=True)
    if fmt == "jsonl_ner":
        return parse_jsonl_ner(content)
    if fmt == "tweetner7":
        return parse_tweetner7(content)
    if fmt == "docred":
        return parse_docred_ner(content)
    if fmt == "cadec":
        return parse_cadec_jsonl(content)
    if fmt == "bc5cdr":
        return parse_bc5cdr(content)
    if fmt == "ncbi":
        return parse_ncbi_disease(content)
    if fmt == "gap":
        return parse_gap_ner(content)
    if fmt == "preco_jsonl":
        return parse_preco_ner(content)
    if fmt == "litbank":
        return parse_litbank_ner(content)
    if fmt == "ecb_plus":
        return parse_ecb_plus(content)
    return parse_hf_api(content)


# --------------------------------------------------------------------------
# coreference loaders (load_coref loader.rs:3730-3800;
#                      coref_loader.rs:41-400)


def parse_gap_examples(content: str) -> list:
    """GAP TSV → examples (coref_loader.rs:275-319). Columns: ID, Text,
    Pronoun, Pronoun-offset, A, A-offset, A-coref, B, B-offset, B-coref,
    URL."""
    examples = []
    for i, line in enumerate(content.splitlines()):
        if i == 0:
            continue
        parts = line.split("\t")
        if len(parts) < 10:
            continue

        def _int(s):
            try:
                return int(s)
            except ValueError:
                return 0

        examples.append({
            "id": parts[0], "text": parts[1],
            "pronoun": parts[2], "pronoun_offset": _int(parts[3]),
            "name_a": parts[4], "offset_a": _int(parts[5]),
            "coref_a": parts[6].lower() == "true",
            "name_b": parts[7], "offset_b": _int(parts[8]),
            "coref_b": parts[9].lower() == "true",
            "url": parts[10] if len(parts) > 10 else None,
        })
    return examples


def _mention(text, start, end, mtype):
    return {"text": text, "start": start, "end": end, "mention_type": mtype}


def gap_to_chains(ex: dict) -> list:
    """GapExample::to_coref_document (coref_loader.rs:71-116): chains per
    the coref_a/coref_b labels; the non-referent name (and, when neither
    matches, the pronoun) become singletons."""
    pron = _mention(ex["pronoun"], ex["pronoun_offset"],
                    ex["pronoun_offset"] + len(ex["pronoun"]), "pronoun")
    a = _mention(ex["name_a"], ex["offset_a"],
                 ex["offset_a"] + len(ex["name_a"]), "proper")
    b = _mention(ex["name_b"], ex["offset_b"],
                 ex["offset_b"] + len(ex["name_b"]), "proper")
    if ex["coref_a"]:
        return [[a, pron], [b]]
    if ex["coref_b"]:
        return [[a], [b, pron]]
    return [[a], [b], [pron]]


def parse_preco_coref(content: str) -> list:
    """PreCo JSONL/JSON → docs with chains (loader.rs:3760-3782 +
    coref_loader.rs:135-190, 323-390). Text rebuilt by space-joining each
    sentence and appending a trailing space; mentions are
    (sent, start_tok, end_tok_exclusive) per cluster. Char-native (the
    byte→char conversion collapses in Python, SURVEY T4)."""
    content = content.strip()
    if content.startswith("["):
        docs_json = json.loads(content)
    else:
        docs_json = []
        for line in content.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                docs_json.append(json.loads(line))
            except ValueError:
                continue
    docs = []
    for idx, doc in enumerate(docs_json):
        if not isinstance(doc, dict):
            continue
        sentences = []
        for sent in doc.get("sentences") or []:
            if isinstance(sent, list):
                sentences.append([t for t in sent if isinstance(t, str)])
        text = ""
        token_offsets = []
        for sentence in sentences:
            sent_offsets = []
            for i, token in enumerate(sentence):
                if i > 0:
                    text += " "
                start = len(text)
                text += token
                sent_offsets.append((start, len(text)))
            text += " "
            token_offsets.append(sent_offsets)
        clusters = {}
        for ci, cluster in enumerate(doc.get("mention_clusters") or []):
            if not isinstance(cluster, list):
                continue
            for m in cluster:
                if not (isinstance(m, list) and len(m) >= 3):
                    continue
                sent_idx, start_tok, end_tok = m[0], m[1], m[2]
                if not all(isinstance(v, int) for v in (sent_idx, start_tok,
                                                        end_tok)):
                    continue
                if sent_idx >= len(token_offsets):
                    continue
                sent_toks = token_offsets[sent_idx]
                if start_tok >= len(sent_toks) or end_tok > len(sent_toks):
                    continue
                cstart = sent_toks[start_tok][0]
                cend = sent_toks[max(end_tok - 1, start_tok)][1]
                clusters.setdefault(ci, []).append(
                    _mention(text[cstart:cend], cstart, cend, "unknown"))
        doc_id = doc.get("id")
        if not isinstance(doc_id, str):
            doc_id = f"doc_{idx}"
        docs.append({"doc_id": doc_id, "text": text,
                     "chains": [clusters[k] for k in sorted(clusters)]})
    return docs


def parse_litbank_coref(content: str) -> list:
    """LitBank .ann coref chains from T mentions + R Coref links
    (loader.rs:3822-3920). Chain merging transcribed including two
    reference quirks: merged members are re-keyed by mention *text*, and
    R-line args are read from whitespace-split positions 1-2 — on a
    standard brat line ("R1\\tCoref Arg1:T1 Arg2:T2") position 1 is the
    "Coref" token itself, so such lines never form a chain."""
    mentions = {}
    links = []
    for line in content.splitlines():
        if line.startswith("T"):
            parts = line.split("\t")
            if len(parts) >= 3:
                type_span = parts[1].split()
                if len(type_span) >= 3:
                    try:
                        start, end = int(type_span[1]), int(type_span[2])
                    except ValueError:
                        start, end = 0, 0
                    mentions[parts[0]] = _mention(parts[2], start, end,
                                                  "unknown")
        elif line.startswith("R") and "Coref" in line:
            parts = line.split()
            if len(parts) >= 3:
                links.append((parts[1].removeprefix("Arg1:"),
                              parts[2].removeprefix("Arg2:")))

    chains = []
    m2c = {}
    for id1, id2 in links:
        c1, c2 = m2c.get(id1), m2c.get(id2)
        if c1 is not None and c2 is not None and c1 != c2:
            chains[c1].extend(chains[c2])
            chains[c2] = []
            for m in chains[c1]:
                m2c[m["text"]] = c1   # reference quirk: keyed by text
        elif c1 is not None and c2 is None:
            if id2 in mentions:
                chains[c1].append(dict(mentions[id2]))
                m2c[id2] = c1
        elif c1 is None and c2 is not None:
            if id1 in mentions:
                chains[c2].append(dict(mentions[id1]))
                m2c[id1] = c2
        elif c1 is None and c2 is None:
            idx = len(chains)
            chain = []
            if id1 in mentions:
                chain.append(dict(mentions[id1]))
                m2c[id1] = idx
            if id2 in mentions:
                chain.append(dict(mentions[id2]))
                m2c[id2] = idx
            chains.append(chain)
    return [{"doc_id": "litbank_0", "text": "",
             "chains": [c for c in chains if c]}]


def parse_coref_content(content: str, key: str) -> list:
    """load_coref dispatch (loader.rs:3751-3800): GAP/WikiCoref/ECB+ use
    the GAP parser (reference placeholder behavior for the latter two),
    PreCo its JSON, LitBank the .ann chains."""
    info = DATASETS[key]
    if "coref" not in info.categories:
        raise ValueError(f"{key} is not a coreference dataset")
    if key == "preco":
        return parse_preco_coref(content)
    if key == "litbank":
        return parse_litbank_coref(content)
    # gap, wikicoref, ecb_plus
    return [{"doc_id": ex["id"], "text": ex["text"],
             "chains": gap_to_chains(ex)} for ex in parse_gap_examples(content)]


# --------------------------------------------------------------------------
# relation loader (load_relation loader.rs:3924-3971;
#                  parse_docred_relations loader.rs:3987-4160)


def parse_docred_relations(content: str) -> list:
    """CrossRE JSONL → docs with gold relations. Token→char offsets by
    space-join (no trailing space after the last token); entity text/type
    resolved through the ner span map with an ENTITY/empty-text fallback
    for relations whose span has no ner entry."""
    documents = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            doc = json.loads(line)
        except ValueError:
            continue
        toks = doc.get("sentence")
        if not isinstance(toks, list):
            continue
        words = [t for t in toks if isinstance(t, str)]
        text = " ".join(words)
        token_to_char = []
        pos = 0
        for i, w in enumerate(words):
            token_to_char.append(pos)
            pos += len(w)
            if i < len(words) - 1:
                pos += 1

        def span_end(tok_end, char_start, ent_len):
            if tok_end < len(token_to_char):
                return token_to_char[tok_end] + len(words[tok_end])
            return char_start + ent_len

        entity_map = {}
        for span in doc.get("ner") or []:
            if isinstance(span, list) and len(span) >= 3:
                ts = span[0] if isinstance(span[0], int) else 0
                te = span[1] if isinstance(span[1], int) else 0
                etype = span[2] if isinstance(span[2], str) else "ENTITY"
                etext = " ".join(words[ts:te + 1])
                cstart = token_to_char[ts] if ts < len(token_to_char) else 0
                entity_map[(ts, te)] = (etype, etext, cstart,
                                        span_end(te, cstart, len(etext)))

        relations = []
        for rel in doc.get("relations") or []:
            if not (isinstance(rel, list) and len(rel) >= 5):
                continue
            hs, he, ts, te = (v if isinstance(v, int) else 0 for v in rel[:4])
            rtype = rel[4] if isinstance(rel[4], str) else "RELATION"

            def resolve(a, b):
                hit = entity_map.get((a, b))
                if hit is not None:
                    return hit
                cstart = token_to_char[a] if a < len(token_to_char) else 0
                return ("ENTITY", "", cstart, span_end(b, cstart, 0))

            htype, htext, hcs, hce = resolve(hs, he)
            ttype, ttext, tcs, tce = resolve(ts, te)
            relations.append({
                "head_start": hcs, "head_end": hce, "head_type": htype,
                "head_text": htext,
                "tail_start": tcs, "tail_end": tce, "tail_type": ttype,
                "tail_text": ttext,
                "rel_type": rtype,
            })
        if text:
            documents.append({"text": text, "relations": relations})
    return documents


# --------------------------------------------------------------------------
# Spark readers — binaryFile (one task per file) → mapInPandas

_ENTITY_T = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("entity_type", T.StringType()),
    T.StructField("original_label", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
])

NER_DATASET_SCHEMA = T.StructType([
    T.StructField("dataset", T.StringType()),
    T.StructField("file", T.StringType()),
    T.StructField("sentence_id", T.LongType()),
    T.StructField("tokens", T.ArrayType(T.StringType())),
    T.StructField("ner_tags", T.ArrayType(T.StringType())),
    T.StructField("text", T.StringType()),
    T.StructField("entities", T.ArrayType(_ENTITY_T)),
])

_MENTION_T = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("mention_type", T.StringType()),
])

COREF_DATASET_SCHEMA = T.StructType([
    T.StructField("dataset", T.StringType()),
    T.StructField("file", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("chains", T.ArrayType(T.ArrayType(_MENTION_T))),
])

_RELATION_T = T.StructType([
    T.StructField("head_start", T.LongType()),
    T.StructField("head_end", T.LongType()),
    T.StructField("head_type", T.StringType()),
    T.StructField("head_text", T.StringType()),
    T.StructField("tail_start", T.LongType()),
    T.StructField("tail_end", T.LongType()),
    T.StructField("tail_type", T.StringType()),
    T.StructField("tail_text", T.StringType()),
    T.StructField("rel_type", T.StringType()),
])

RELATION_DATASET_SCHEMA = T.StructType([
    T.StructField("dataset", T.StringType()),
    T.StructField("file", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("relations", T.ArrayType(_RELATION_T)),
])


def _files(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("binaryFile").load(path).select("path", "content")


def read_ner_dataset(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Dataset files → one row per annotated sentence, gold entities
    BIO-decoded in the same pass. One task per file; Arrow-batched."""
    if key not in DATASETS:
        key = dataset_from_str(key).key

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in NER_DATASET_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                text = bytes(content).decode("utf-8", errors="replace")
                for sid, sent in enumerate(parse_ner_content(text, key)):
                    toks = [t for t, _ in sent]
                    tags = [g for _, g in sent]
                    rows.append((key, fpath, sid, toks, tags,
                                 " ".join(toks), bio_entities(toks, tags)))
            yield pd.DataFrame(rows, columns=cols)

    return _files(spark, path).mapInPandas(parse, schema=NER_DATASET_SCHEMA)


def read_coref_dataset(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Coref dataset files → one row per document with mention chains."""
    if key not in DATASETS:
        key = dataset_from_str(key).key

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in COREF_DATASET_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                text = bytes(content).decode("utf-8", errors="replace")
                for doc in parse_coref_content(text, key):
                    rows.append((key, fpath, doc["doc_id"], doc["text"],
                                 doc["chains"]))
            yield pd.DataFrame(rows, columns=cols)

    return _files(spark, path).mapInPandas(parse, schema=COREF_DATASET_SCHEMA)


def read_relation_dataset(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Relation dataset files → one row per document with gold relations."""
    if key not in DATASETS:
        key = dataset_from_str(key).key
    if "relation" not in DATASETS[key].categories:
        raise ValueError(f"{key} is not a relation extraction dataset")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RELATION_DATASET_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                text = bytes(content).decode("utf-8", errors="replace")
                for did, doc in enumerate(parse_docred_relations(text)):
                    rows.append((key, fpath, did, doc["text"],
                                 doc["relations"]))
            yield pd.DataFrame(rows, columns=cols)

    return _files(spark, path).mapInPandas(parse, schema=RELATION_DATASET_SCHEMA)


def dataset_stats(df: DataFrame) -> DataFrame:
    """DatasetStats (loader.rs:1906-1940) as one aggregate row:
    sentences / tokens / entities. Single map-side-combined agg."""
    from pyspark.sql import functions as F
    return df.agg(
        F.count("*").alias("sentences"),
        F.coalesce(F.sum(F.size("tokens")), F.lit(0)).alias("tokens"),
        F.coalesce(F.sum(F.size("entities")), F.lit(0)).alias("entities"),
    )


def entities_by_type(df: DataFrame) -> DataFrame:
    """entity_counts_by_type (loader.rs:1894-1904): keyed by the
    *original* dataset label."""
    from pyspark.sql import functions as F
    return (df.select(F.explode("entities").alias("e"))
              .groupBy(F.col("e.original_label").alias("original_label"))
              .agg(F.count("*").alias("n")))


# --------------------------------------------------------------------------
# deterministic fixtures — valid bytes per format, for tests/smoke runs

FIXTURES = {
    "conll2": (
        "\nJohn B-PER\nSmith I-PER\nworks O\nat O\nGoogle B-ORG\n. O\n\n"
        "Apple B-ORG\nannounced O\ntoday O\n. O\n"
    ),
    "conll4": (
        "\n-DOCSTART- -X- -X- O\n\n"
        "EU NNP B-NP B-ORG\nrejects VBZ B-VP O\nGerman JJ B-NP B-MISC\n"
        "call NN I-NP O\n. . O O\n\n"
        "Peter NNP B-NP B-PER\nBlackburn NNP I-NP I-PER\n"
    ),
    "mit": (
        "B-Actor\tdenzel\nI-Actor\twashington\nO\tmovies\n\n"
        "O\tfind\nB-Genre\tcomedy\nO\tfilms\n"
    ),
    "jsonl_ner": (
        '{"tokens": ["Alice", "visited", "Paris"], "ner_tags": [1, 0, 5]}\n'
        '{"tokens": ["Bob", "Jones", "left"], "ner_tags": [1, 2, 0]}\n'
    ),
    "hf_api": json.dumps({
        "features": [
            {"name": "tokens", "type": {}},
            {"name": "ner_tags",
             "type": {"feature": {"names": ["O", "B-PER", "I-PER", "B-ORG",
                                            "I-ORG"]}}},
        ],
        "rows": [
            {"row_idx": 0,
             "row": {"tokens": ["Marie", "Curie", "joined", "Sorbonne"],
                     "ner_tags": [1, 2, 0, 3]}},
            {"row_idx": 1,
             "row": {"tokens": ["Atoms", "bond"], "ner_tags": [0, 0]}},
        ],
    }, separators=(",", ":")),
    "tweetner7": (
        '{"tokens": ["Tesla", "ships", "cars"], "tags": [0, 14, 14]}\n'
        '{"tokens": ["Taylor", "Swift", "sings"], "tags": [5, 12, 14]}\n'
    ),
    "docred": (
        '{"sentence": ["Ada", "Lovelace", "wrote", "for", "Babbage"], '
        '"ner": [[0, 1, "person"], [4, 4, "person"]], '
        '"relations": [[0, 1, 4, 4, "collaborator"]]}\n'
        '{"sentence": ["Turing", "founded", "nothing"], '
        '"ner": [[0, 0, "person"]], "relations": []}\n'
    ),
    "cadec": (
        # space-join offsets: severe(0,6) pain(7,11) in(12,14) legs(15,19)
        '{"tokens": ["severe", "pain", "in", "legs"], "entities": '
        '[{"label": "ADR", "spans": [[0, 11], [15, 19]]}]}\n'
        '{"tokens": ["took", "ibuprofen", "daily"], "entities": '
        '[{"label": "drug", "start": 5, "end": 14}]}\n'
        '{"tokens": ["felt", "dizzy"], "ner_tags": [0, 11]}\n'
    ),
    "cadec_hf": json.dumps({
        "rows": [
            {"row_idx": 0,
             "row": {"text": "I had severe headache after the dose",
                     "ade": "severe headache", "term_PT": "Headache"}},
        ],
        "features": [{"name": "text"}, {"name": "ade"}],
    }, separators=(",", ":")),
    "bc5cdr": (
        "Aspirin\tNN\tB-NP\tB-Entity\nhelps\tVBZ\tB-VP\tO\n"
        "headaches\tNNS\tB-NP\tI-Entity\n\n"
        "Water\tNN\tB-NP\tO\nis\tVBZ\tB-VP\tO\nsafe\tJJ\tB-ADJP\tO\n"
    ),
    "ncbi": (
        "colorectal\tJJ\tB-NP\tB-Disease\ncancer\tNN\tI-NP\tI-Disease\n"
        "screening\tNN\tI-NP\tO\n\n"
        "healthy\tJJ\tB-NP\tO\ncells\tNNS\tI-NP\tO\n"
    ),
    "gap": (
        "ID\tText\tPronoun\tPronoun-offset\tA\tA-offset\tA-coref\tB\t"
        "B-offset\tB-coref\tURL\n"
        "test-1\tAlice met Beth before she left\tshe\t22\tAlice\t0\tTRUE\t"
        "Beth\t10\tFALSE\thttp://example.org/a\n"
        "test-2\tCarl saw Dave and he waved\the\t18\tCarl\t0\tFALSE\t"
        "Dave\t9\tTRUE\thttp://example.org/b\n"
    ),
    "preco": (
        '{"id": "preco_1", "sentences": [["Anna", "sat"], ["She", "read"]], '
        '"mention_clusters": [[[0, 0, 1], [1, 0, 1]]]}\n'
    ),
    # Standard brat R-lines ("R1\tCoref Arg1:T1 Arg2:T2") are degenerate in
    # the reference: split_whitespace puts "Coref" at parts[1], so neither
    # looked-up id exists and no chain forms (loader.rs:3850-3857). The two
    # trailing-"Coref" lines place the args at parts[1]/[2] and exercise
    # the link + chain-merge machinery the standard lines never reach.
    "litbank": (
        "T1\tPER 0 5\tAlice\nT2\tPER 20 23\tshe\nT3\tLOC 30 36\tLondon\n"
        "R1\tCoref Arg1:T1 Arg2:T2\n"
        "R2 Arg1:T1 Arg2:T2 Coref\n"
        "R3 Arg1:T2 Arg2:T3 Coref\n"
    ),
    "ecb_plus": (
        "sentence_id,text,event_mention\n"
        "s1,The board announced a merger,announced\n"
        "s2,Shares rose after the news,rose\n"
    ),
}

# Which fixture exercises each registry format.
_FORMAT_FIXTURE = {
    "conll": "conll4", "mit": "mit", "jsonl_ner": "jsonl_ner",
    "hf_api": "hf_api", "tweetner7": "tweetner7", "docred": "docred",
    "cadec": "cadec", "bc5cdr": "bc5cdr", "ncbi": "ncbi", "gap": "gap",
    "preco_jsonl": "preco", "litbank": "litbank", "ecb_plus": "ecb_plus",
}


def fixture_content(key: str) -> str:
    """Deterministic file content exercising ``key``'s on-disk format."""
    return FIXTURES[_FORMAT_FIXTURE[DATASETS[key].format]]

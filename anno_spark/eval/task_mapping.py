"""Task ↔ dataset ↔ backend capability mappings.

Behavioral port of the reference's mapping tables (reference:
anno/src/eval/task_mapping.rs:39-490): ten task kinds, the many-to-many
dataset/task assignment over the 64-dataset registry
(:mod:`anno_spark.sources.datasets` keys), and per-backend task
capabilities.  The tables are the spec; the lookups are trivial.

Backend names keep the reference's lowercase registry spelling; the
ML-gated names (gliner*/nuner/candle/...) remain mapped so capability
queries answer correctly even though those backends only register when
their runtime exists (same stance as harness.register_ml).
"""

from __future__ import annotations

__all__ = [
    "TASKS",
    "task_name",
    "task_code",
    "dataset_tasks",
    "task_datasets",
    "backend_tasks",
    "detect_backend_capabilities_by_name",
    "build_mapping",
]

# Task enum (task_mapping.rs:39-61)
TASKS = (
    "ner", "ned", "relation_extraction", "intra_doc_coref",
    "inter_doc_coref", "abstract_anaphora", "discontinuous_ner",
    "event_extraction", "text_classification", "hierarchical_extraction",
)

_TASK_NAMES = {
    "ner": "NER", "ned": "NED",
    "relation_extraction": "Relation Extraction",
    "intra_doc_coref": "Intra-document Coreference",
    "inter_doc_coref": "Inter-document Coreference",
    "abstract_anaphora": "Abstract Anaphora",
    "discontinuous_ner": "Discontinuous NER",
    "event_extraction": "Event Extraction",
    "text_classification": "Text Classification",
    "hierarchical_extraction": "Hierarchical Extraction",
}

_TASK_CODES = {
    "ner": "ner", "ned": "ned", "relation_extraction": "re",
    "intra_doc_coref": "coref", "inter_doc_coref": "cdcr",
    "abstract_anaphora": "aa", "discontinuous_ner": "dner",
    "event_extraction": "ee", "text_classification": "cls",
    "hierarchical_extraction": "hier",
}


def task_name(task: str) -> str:
    return _TASK_NAMES[task]


def task_code(task: str) -> str:
    return _TASK_CODES[task]


# dataset -> tasks (task_mapping.rs:113-198), keyed by the registry's
# string keys (sources/datasets.py)
_PLAIN_NER = (
    "wikigold wnut17 mit_movie mit_restaurant conll2003 ontonotes "
    "multinerd bc5cdr ncbi_disease genia anatem bc2gm bc4chemd tweetner7 "
    "broad_twitter fabner fewnerd crossner universalner_bench wikiann "
    "multiconer multiconer_v2 wikineural polyglot_ner universal_ner uner "
    "msner biomner legner conll2002 conll2002_es conll2002_nl ontonotes50 "
    "germeval2014 harem semeval2013_task91 muc6 muc7 jnlpba bc2gm_full "
    "craft finner legalner scierc_ner"
).split()

_RELATION = ("docred retacred nytfb webnlg google_re biored scier mixred "
             "covered").split()

DATASET_TASKS = {
    **{k: ("ner",) for k in _PLAIN_NER},
    # discontinuous also evaluates plain NER (rs:146-149)
    "cadec": ("discontinuous_ner", "ner"),
    "share13": ("discontinuous_ner", "ner"),
    "share14": ("discontinuous_ner", "ner"),
    "ecb_plus": ("inter_doc_coref",),
    "wikicoref": ("inter_doc_coref",),
    "ace2005": ("event_extraction",),
    "aida": ("ned",),
    "tackbp": ("ned",),
    **{k: ("relation_extraction",) for k in _RELATION},
    # coref datasets double as abstract-anaphora sources (rs:190-196)
    "gap": ("intra_doc_coref", "abstract_anaphora"),
    "preco": ("intra_doc_coref", "abstract_anaphora"),
    "litbank": ("intra_doc_coref", "abstract_anaphora"),
}


def dataset_tasks(dataset: str) -> tuple:
    return DATASET_TASKS.get(dataset, ())


def task_datasets(task: str) -> list:
    """Derived inverse of DATASET_TASKS (the reference hand-maintains
    both directions; derivation keeps them consistent by construction —
    registry insertion order preserved, matching rs:200-280)."""
    return [d for d, ts in DATASET_TASKS.items() if task in ts]


# backend -> tasks (task_mapping.rs:283-331); lowercase registry names
BACKEND_TASKS = {
    "pattern": ("ner",),  # structured entities only
    "regex": ("ner",),
    "heuristic": ("ner",),
    "stacked": ("ner",),
    "bert_onnx": ("ner",),
    "candle_ner": ("ner",),
    "nuner": ("ner",),
    "deberta_v3": ("ner",),
    "albert": ("ner",),
    "gliner_onnx": ("ner",),
    "gliner_candle": ("ner",),
    "gliner_poly": ("ner",),
    "universal_ner": ("ner",),
    "gliner2": ("ner", "text_classification", "hierarchical_extraction",
                "relation_extraction"),
    "w2ner": ("ner", "discontinuous_ner"),
    "tplinker": ("ner", "relation_extraction"),
    "coref_resolver": ("intra_doc_coref", "abstract_anaphora"),
    "simple_coref_resolver": ("intra_doc_coref", "abstract_anaphora"),
    "discourse_aware_resolver": ("intra_doc_coref", "abstract_anaphora"),
}


def backend_tasks(backend_name: str) -> tuple:
    return BACKEND_TASKS.get(backend_name.lower(), ())


def detect_backend_capabilities_by_name(backend_name: str) -> list:
    return list(backend_tasks(backend_name))


def get_task_backends(task: str) -> list:
    return [b for b, ts in BACKEND_TASKS.items() if task in ts]


def build_mapping() -> dict:
    """TaskMapping::build (task_mapping.rs:405-465): the four directed
    lookup dicts in one structure."""
    return {
        "task_to_datasets": {t: task_datasets(t) for t in TASKS},
        "dataset_to_tasks": {d: list(ts) for d, ts in DATASET_TASKS.items()},
        "backend_to_tasks": {b: list(ts) for b, ts in BACKEND_TASKS.items()},
        "task_to_backends": {t: get_task_backends(t) for t in TASKS},
    }

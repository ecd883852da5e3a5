"""Synthetic coreference corpora: template, domain, and adversarial sets.

Behavioral port of the reference's coref dataset generators (reference:
anno/src/eval/coref_loader.rs:403-690).  Documents are dicts
``{"doc_id", "text", "chains"}`` with chains as lists of mention dicts
``{"text", "start", "end"}`` — the same chain shape
:mod:`anno_spark.core.box_training` trains on and
:mod:`anno_spark.eval.coref_metrics` scores.

The adversarial pairs (gold, system, name) encode the four classic
coreference-metric stress cases — over-clustering, under-clustering,
missed mention, singletons-vs-one-cluster (coref_loader.rs:604-690) —
used to sanity-check that every metric moves the right way.
"""

from __future__ import annotations

__all__ = [
    "synthetic_coref_dataset",
    "domain_specific_coref_dataset",
    "adversarial_coref_examples",
    "chains_as_spans",
    "documents_df",
]


def _m(text, start, end):
    return {"text": text, "start": start, "end": end}


def _doc(doc_id, text, chains):
    return {"doc_id": doc_id, "text": text, "chains": chains}


# template corpus (coref_loader.rs:404-450): (text, [(mention, start,
# end, cluster_id)])
_TEMPLATES = [
    ("John Smith went to the store. He bought some milk.",
     [("John Smith", 0, 10, 0), ("He", 35, 37, 0)]),
    ("Mary called Bob. She asked him about the meeting.",
     [("Mary", 0, 4, 0), ("She", 17, 20, 0),
      ("Bob", 12, 15, 1), ("him", 27, 30, 1)]),
    ("The CEO announced the merger. She said the company would benefit. "
     "The executive was confident.",
     [("The CEO", 0, 7, 0), ("She", 30, 33, 0),
      ("The executive", 68, 81, 0)]),
    ("Apple released a new iPhone. The tech giant's device sold well.",
     [("Apple", 0, 5, 0), ("The tech giant", 29, 43, 0),
      ("iPhone", 21, 27, 1), ("device", 46, 52, 1)]),
    ("The weather was nice. Sarah went for a walk in the park.",
     [("The weather", 0, 11, 0), ("Sarah", 22, 27, 1),
      ("the park", 47, 55, 2)]),
]


def synthetic_coref_dataset(num_docs: int) -> list:
    """Cycle the five templates (coref_loader.rs:452-478).  Cluster
    grouping preserves cluster-id order."""
    docs = []
    for i in range(num_docs):
        text, mentions = _TEMPLATES[i % len(_TEMPLATES)]
        clusters: dict = {}
        for (mtext, start, end, cid) in mentions:
            clusters.setdefault(cid, []).append(_m(mtext, start, end))
        chains = [clusters[cid] for cid in sorted(clusters)]
        docs.append(_doc(f"synthetic_{i}", text, chains))
    return docs


def _biomedical() -> list:
    return [
        _doc("bio_1",
             "BRCA1 is a tumor suppressor gene. It plays a role in DNA "
             "repair. The gene is frequently mutated in breast cancer.",
             [[_m("BRCA1", 0, 5), _m("It", 34, 36), _m("The gene", 62, 70)]]),
        _doc("bio_2",
             "The patient presented with chest pain. She was diagnosed "
             "with myocardial infarction. The woman received immediate "
             "treatment.",
             [[_m("The patient", 0, 11), _m("She", 39, 42),
               _m("The woman", 85, 94)],
              [_m("myocardial infarction", 62, 83)]]),
        _doc("bio_3",
             "Aspirin inhibits COX-1 and COX-2. The drug reduces "
             "inflammation. It is commonly used for pain relief.",
             [[_m("Aspirin", 0, 7), _m("The drug", 35, 43), _m("It", 65, 67)],
              [_m("COX-1", 17, 22)], [_m("COX-2", 27, 32)]]),
    ]


def _legal() -> list:
    return [
        _doc("legal_1",
             "The defendant entered into a contract with the plaintiff. "
             "He failed to deliver the goods. The accused claimed force "
             "majeure.",
             [[_m("The defendant", 0, 13), _m("He", 58, 60),
               _m("The accused", 89, 100)],
              [_m("the plaintiff", 43, 56)]]),
        _doc("legal_2",
             "Article 5 of the Treaty governs this matter. It states that "
             "parties must negotiate in good faith. The provision has been "
             "interpreted broadly.",
             [[_m("Article 5 of the Treaty", 0, 23), _m("It", 45, 47),
               _m("The provision", 99, 112)]]),
    ]


def _news() -> list:
    return [
        _doc("news_1",
             "President Biden met with Chancellor Scholz. The American "
             "leader discussed trade. He emphasized cooperation. Biden "
             "later held a press conference.",
             [[_m("President Biden", 0, 14), _m("The American leader", 44, 63),
               _m("He", 81, 83), _m("Biden", 107, 112)],
              [_m("Chancellor Scholz", 25, 42)]]),
        _doc("news_2",
             "Nvidia announced record quarterly earnings. The chipmaker "
             "exceeded expectations. Its stock rose 5% in after-hours "
             "trading.",
             [[_m("Nvidia", 0, 6), _m("The chipmaker", 44, 57),
               _m("Its", 80, 83)]]),
        _doc("news_3",
             "The hurricane made landfall in Florida. It caused widespread "
             "damage. The storm was Category 4. Authorities ordered "
             "evacuations before it arrived.",
             [[_m("The hurricane", 0, 13), _m("It", 40, 42),
               _m("The storm", 68, 77), _m("it", 133, 135)]]),
    ]


def domain_specific_coref_dataset(domain: str) -> list:
    """biomedical/legal/news; anything else falls back to 5 template
    docs (coref_loader.rs:482-490)."""
    if domain == "biomedical":
        return _biomedical()
    if domain == "legal":
        return _legal()
    if domain == "news":
        return _news()
    return synthetic_coref_dataset(5)


def adversarial_coref_examples() -> list:
    """(gold_doc, system_doc, name) stress cases
    (coref_loader.rs:604-690)."""
    t1 = "John saw Mary. He waved."
    t2 = "Barack Obama gave a speech. The president was eloquent. Obama smiled."
    t3 = "The dog ran. It was fast. The animal stopped."
    return [
        (_doc("adv_1g", t1, [[_m("John", 0, 4), _m("He", 15, 17)],
                             [_m("Mary", 9, 13)]]),
         _doc("adv_1s", t1, [[_m("John", 0, 4), _m("Mary", 9, 13),
                              _m("He", 15, 17)]]),
         "over-clustering"),
        (_doc("adv_2g", t2, [[_m("Barack Obama", 0, 12),
                              _m("The president", 28, 41),
                              _m("Obama", 56, 61)]]),
         _doc("adv_2s", t2, [[_m("Barack Obama", 0, 12), _m("Obama", 56, 61)],
                             [_m("The president", 28, 41)]]),
         "under-clustering"),
        (_doc("adv_3g", t3, [[_m("The dog", 0, 7), _m("It", 13, 15),
                              _m("The animal", 26, 36)]]),
         _doc("adv_3s", t3, [[_m("The dog", 0, 7), _m("It", 13, 15)]]),
         "missed-mention"),
        (_doc("adv_4g", "A B C", [[_m("A", 0, 1)], [_m("B", 2, 3)],
                                  [_m("C", 4, 5)]]),
         _doc("adv_4s", "A B C", [[_m("A", 0, 1), _m("B", 2, 3),
                                   _m("C", 4, 5)]]),
         "singletons-vs-one-cluster"),
    ]


def chains_as_spans(doc: dict) -> list:
    """Chains as hashable (start, end) span lists — the
    coref_metrics input shape."""
    return [[(m["start"], m["end"]) for m in chain]
            for chain in doc["chains"]]


def documents_df(spark, docs: list | None = None):
    """Corpus as a DataFrame with nested chains — the shape the
    box-training pair generator and metric jobs read."""
    docs = docs if docs is not None else synthetic_coref_dataset(5)
    rows = [(d["doc_id"], d["text"],
             [[(m["text"], m["start"], m["end"]) for m in chain]
              for chain in d["chains"]])
            for d in docs]
    return spark.createDataFrame(
        rows,
        "doc_id string, text string, chains array<array<struct<"
        "text string, start long, end long>>>")

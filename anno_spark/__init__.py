"""anno_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of the ``anno``
information-extraction pipeline (reference: /root/reference, Rust), recast
as a distributed KG-construction engine over web-page tables:

    pages(url, warc_ts, html, text, lang)
      -> mentions (NER over extracted text)
      -> triples  (subj, pred, obj)
      -> tracks   (within-doc coreference)
      -> identities (cross-doc entity resolution: MinHash/LSH blocking +
                     iterative connected components)
      -> nodes / edges (graph materialization)

Layout:
  anno_spark.core      pure-Python operator payloads (also the pytest oracle)
  anno_spark.sparkjobs DataFrame pipeline: mapInPandas extraction, LSH join,
                       CC loop, graph build, checkpoint/resume, metrics
  anno_spark.ops       training-data ops: dedup, similarity search,
                       text analysis, multimodal plumbing
  anno_spark.corpus    deterministic synthetic Common-Crawl-style corpus
"""

__version__ = "0.1.0"

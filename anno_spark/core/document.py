"""Per-document extraction: the Arrow-UDF payload (SURVEY §3, EP1–EP3).

One call = the reference's single-doc pipeline:
text → StackedNER (EP1, extract.rs:139-141) → relation extraction
(inference.rs:2014-2073) → within-doc coref tracks (EP3, utils.rs:322-548).

Doc-local pairwise loops are bounded by ``max_mentions_per_doc`` so one
pathological page cannot stall an executor task (SURVEY §7.6); overflow is
reported so the pipeline can emit it as a lineage metric.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import coref as coref_mod
from . import relations as relations_mod
from . import stacked
from .entity import Mention, Triple

# C5 — KB linking demo map (utils.rs:555-625): lowercased canonical → (qid, description).
KNOWN_KB_ENTITIES = {
    "barack obama": ("Q76", "44th President of the United States"),
    "angela merkel": ("Q567", "Chancellor of Germany 2005-2021"),
    "berlin": ("Q64", "Capital of Germany"),
    "nato": ("Q7184", "North Atlantic Treaty Organization"),
    "donald trump": ("Q22686", "45th President of the United States"),
    "joe biden": ("Q6279", "46th President of the United States"),
    "vladimir putin": ("Q7747", "President of Russia"),
    "emmanuel macron": ("Q3052772", "President of France"),
    "elon musk": ("Q317521", "CEO of Tesla and SpaceX"),
    "marie curie": ("Q7186", "Physicist and chemist"),
    "albert einstein": ("Q937", "Theoretical physicist"),
    "new york": ("Q60", "City in New York State"),
    "london": ("Q84", "Capital of the United Kingdom"),
    "paris": ("Q90", "Capital of France"),
    "google": ("Q95", "American technology company"),
    "apple": ("Q312", "American technology company"),
    "microsoft": ("Q2283", "American technology company"),
    "united nations": ("Q1065", "International organization"),
    "european union": ("Q458", "Political and economic union"),
}

MAX_MENTIONS_PER_DOC = 512  # bound for doc-local O(n²) loops (SURVEY §7.6)


@dataclass
class DocExtraction:
    mentions: list = field(default_factory=list)  # list[Mention]
    triples: list = field(default_factory=list)  # list[Triple]
    tracks: list = field(default_factory=list)  # list[Track]
    pronoun_count: int = 0
    truncated: bool = False


def extract_document(
    text: str,
    do_coref: bool = True,
    max_mentions: int = MAX_MENTIONS_PER_DOC,
) -> DocExtraction:
    """Full single-doc extraction; oracle for the Spark pipeline."""
    out = DocExtraction()
    if not text:
        return out
    mentions = stacked.extract_entities(text)
    if len(mentions) > max_mentions:
        mentions = mentions[:max_mentions]
        out.truncated = True
    out.mentions = mentions
    out.triples = relations_mod.extract_relations(mentions, text)
    if do_coref:
        cr = coref_mod.resolve_coreference(text, mentions)
        out.tracks = cr.tracks
        out.pronoun_count = len(cr.pronoun_signal_ids)
    return out


def kb_link(canonical_lower: str):
    """C5 — → (kb_id, description) or (None, None)."""
    hit = KNOWN_KB_ENTITIES.get(canonical_lower)
    return hit if hit else (None, None)

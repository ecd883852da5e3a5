"""Driver-side GroundedDocument (reference anno-core/src/grounded.rs).

A plain-dict representation of the Signal → Track → Identity hierarchy
that the CLI commands build, print, and serialize.  The JSON layout is
the one :mod:`anno_spark.sources.jsonl` parses (crossdoc.rs:245-424), so
``extract --export`` output round-trips through ``crossdoc --import`` and
through the Spark JSONL source alike.

Also hosts the single-document graph export (graph.rs:386-575,
from_grounded_document graph.rs:628-643): node ids follow the same
priority rule the distributed operators/graph.py uses
(kb_id > coref_<id> > "{type}:{name}", graph.rs:677-691).
"""

from __future__ import annotations

import json

from ..core.annotations import detect_quantifier, is_negated
from ..core.coref import resolve_coreference
from ..core.document import kb_link


def make_signal(sid: int, m, negated: bool = False, quantifier: str | None = None) -> dict:
    """grounded.rs Signal::new — offsets are char offsets."""
    return {
        "id": sid,
        "surface": m.text,
        "label": m.entity_type,
        "start": m.start,
        "end": m.end,
        "confidence": round(float(m.confidence), 6),
        "negated": negated,
        "quantifier": quantifier,
    }


class GroundedDoc:
    """Minimal GroundedDocument: id, text, signals, tracks, identities."""

    def __init__(self, doc_id: str, text: str):
        self.id = doc_id
        self.text = text
        self.signals: list[dict] = []
        self.tracks: list[dict] = []
        self.identities: list[dict] = []

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def add_mentions(self, mentions, negation: bool = False, quantifiers: bool = False):
        """extract.rs:162-193 — mentions → validated signals with optional
        negation/quantifier tagging.  Returns validation error strings for
        out-of-bounds or surface-mismatched spans
        (grounded.rs add_signal_validated)."""
        errors: list[str] = []
        n = len(self.text)
        for m in mentions:
            if m.start < 0 or m.end > n or m.start >= m.end:
                errors.append(
                    f"signal span [{m.start},{m.end}) out of bounds for text length {n}"
                )
                continue
            if self.text[m.start:m.end] != m.text:
                errors.append(
                    f"signal surface {m.text!r} != text[{m.start}:{m.end}] "
                    f"{self.text[m.start:m.end]!r}"
                )
                continue
            neg = negation and is_negated(self.text, m.start)
            quant = detect_quantifier(self.text, m.start) if quantifiers else None
            # reference serializes the Quantifier enum Debug name
            # ("Universal", extract.rs:222); core returns the lowercase tag
            quant = quant.capitalize() if quant else None
            self.signals.append(make_signal(len(self.signals), m, neg, quant))
        return errors

    def run_coref(self, mentions):
        """pipeline.rs:162-163 → core.coref (C1-C3); appends pronoun
        signals and materializes tracks."""
        cr = resolve_coreference(self.text, mentions)
        for sid in range(len(self.signals), len(cr.signals)):
            self.signals.append(make_signal(sid, cr.signals[sid]))
        for t in cr.tracks:
            self.tracks.append(
                {
                    "id": t.track_id,
                    "canonical_surface": t.canonical_surface,
                    "entity_type": t.entity_type,
                    "signal_ids": list(t.signal_ids),
                }
            )
        return cr

    def link_kb(self):
        """utils.rs:555-625 — one identity per track; known canonical
        surfaces get wikidata ids via core.document.kb_link (C5 map)."""
        for t in self.tracks:
            qid, description = kb_link(t["canonical_surface"].lower())
            ident = {
                "id": len(self.identities),
                "canonical_name": t["canonical_surface"],
                "entity_type": t["entity_type"],
                "kb_id": qid,
                "kb_source": "wikidata" if qid else None,
                "aliases": [description] if description else [],
                "track_ids": [t["id"]],
            }
            self.identities.append(ident)
            t["identity_id"] = ident["id"]

    # ------------------------------------------------------------------
    # stats & serialization
    # ------------------------------------------------------------------

    def stats(self) -> dict:
        """grounded.rs DocumentStats."""
        n = len(self.signals)
        avg = sum(s["confidence"] for s in self.signals) / n if n else 0.0
        return {
            "signal_count": n,
            "track_count": len(self.tracks),
            "identity_count": len(self.identities),
            "avg_confidence": avg,
        }

    def to_dict(self, export_format: str = "full") -> dict:
        """extract.rs:323-362 — full | signals | minimal.

        ``entities`` mirrors the signals so the JSON feeds straight into
        sources/jsonl.py's GROUNDED_DOC_SCHEMA.
        """
        entities = [
            {
                "text": s["surface"],
                "entity_type": s["label"],
                "start": s["start"],
                "end": s["end"],
                "confidence": s["confidence"],
            }
            for s in self.signals
        ]
        if export_format == "minimal":
            return {
                "id": self.id,
                "text": self.text,
                "signals": [
                    {
                        "surface": s["surface"],
                        "label": s["label"],
                        "start": s["start"],
                        "end": s["end"],
                        "confidence": s["confidence"],
                    }
                    for s in self.signals
                ],
                "entities": entities,
            }
        if export_format == "signals":
            return {
                "id": self.id,
                "text": self.text,
                "signals": self.signals,
                "entities": entities,
            }
        return {
            "id": self.id,
            "text": self.text,
            "signals": self.signals,
            "tracks": self.tracks,
            "identities": self.identities,
            "entities": entities,
        }

    def to_json(self, export_format: str = "full", pretty: bool = True) -> str:
        d = self.to_dict(export_format)
        return json.dumps(d, indent=2 if pretty else None, ensure_ascii=False)


def from_dict(d: dict) -> GroundedDoc:
    """crossdoc.rs:264-311 — parse an imported GroundedDocument JSON.

    Accepts both this module's output and the flexible reference layout
    ({entities: [{text, entity_type|label, start, end, confidence}]}).
    """
    doc = GroundedDoc(str(d.get("id", "")), d.get("text") or "")
    sigs = d.get("signals")
    if sigs:
        for s in sigs:
            doc.signals.append(
                {
                    "id": s.get("id", len(doc.signals)),
                    "surface": s.get("surface") or s.get("text") or "",
                    "label": s.get("label") or s.get("entity_type") or "UNK",
                    "start": int(s.get("start", 0)),
                    "end": int(s.get("end", 0)),
                    "confidence": float(s.get("confidence", 1.0)),
                    "negated": bool(s.get("negated", False)),
                    "quantifier": s.get("quantifier"),
                }
            )
    else:
        for e in d.get("entities") or []:
            doc.signals.append(
                {
                    "id": len(doc.signals),
                    "surface": e.get("text") or "",
                    "label": e.get("entity_type") or e.get("label") or "UNK",
                    "start": int(e.get("start", 0)),
                    "end": int(e.get("end", 0)),
                    "confidence": float(e.get("confidence", 1.0)),
                    "negated": False,
                    "quantifier": None,
                }
            )
    for t in d.get("tracks") or []:
        doc.tracks.append(dict(t))
    for i in d.get("identities") or []:
        doc.identities.append(dict(i))
    return doc


# ---------------------------------------------------------------------------
# Graph export (graph.rs:386-575) — single-doc, driver-side
# ---------------------------------------------------------------------------


def _node_id(signal: dict, kb_by_track: dict, track_of_signal: dict) -> str:
    """graph.rs:677-691 — kb_id > coref_<track> > type:name."""
    tid = track_of_signal.get(signal["id"])
    if tid is not None:
        kb = kb_by_track.get(tid)
        if kb:
            return kb
        return f"coref_{tid}"
    return f"{signal['label'].lower()}:{signal['surface'].lower().replace(' ', '_')}"


def _cypher_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _cypher_ident(s: str) -> str:
    return "".join(c if c.isalnum() or c == "_" else "_" for c in s)


def build_graph(doc: GroundedDoc, triples) -> tuple[list[dict], list[dict]]:
    """→ (nodes, edges) from a grounded doc + extracted triples.

    Nodes dedup on node id (first occurrence wins, graph.rs:227-248);
    edges require both endpoints to exist (graph.rs:292-312), matching
    the distributed edges_table inner-join rule.
    """
    track_of_signal: dict[int, int] = {}
    for t in doc.tracks:
        for sid in t["signal_ids"]:
            track_of_signal[sid] = t["id"]
    kb_by_track = {}
    for ident in doc.identities:
        if ident.get("kb_id"):
            for tid in ident.get("track_ids", []):
                kb_by_track[tid] = ident["kb_id"]

    nodes: list[dict] = []
    seen: dict[str, dict] = {}
    id_by_span: dict[tuple[int, int], str] = {}
    for s in doc.signals:
        if s["label"] == "PRON":
            continue
        nid = _node_id(s, kb_by_track, track_of_signal)
        id_by_span[(s["start"], s["end"])] = nid
        if nid in seen:
            seen[nid]["mention_count"] += 1
        else:
            node = {
                "id": nid,
                "name": s["surface"],
                "node_type": s["label"],
                "mention_count": 1,
            }
            seen[nid] = node
            nodes.append(node)

    edges: list[dict] = []
    for tr in triples:
        src = id_by_span.get((tr.subj_start, tr.subj_end))
        dst = id_by_span.get((tr.obj_start, tr.obj_end))
        if src is None or dst is None:
            continue
        edges.append(
            {
                "source": src,
                "target": dst,
                "relation": tr.pred,
                "confidence": float(tr.confidence),
            }
        )
    return nodes, edges


def graph_to_cypher(nodes, edges) -> str:
    """graph.rs:386-421 — CREATE nodes, MATCH+CREATE edges."""
    out = []
    for n in nodes:
        out.append(
            f"CREATE (n{_cypher_ident(n['id'])}:{_cypher_ident(n['node_type'])} "
            f"{{id: '{_cypher_escape(n['id'])}', name: '{_cypher_escape(n['name'])}', "
            f"mention_count: {n['mention_count']}}});"
        )
    out.append("")
    for e in edges:
        props = f" {{confidence: {e['confidence']:.3f}}}" if e["confidence"] < 1.0 else ""
        out.append(
            f"MATCH (a {{id: '{_cypher_escape(e['source'])}'}}), "
            f"(b {{id: '{_cypher_escape(e['target'])}'}}) "
            f"CREATE (a)-[:{_cypher_ident(e['relation'])}{props}]->(b);"
        )
    return "\n".join(out) + "\n"


def graph_to_networkx_json(nodes, edges) -> str:
    """graph.rs node_link_graph layout."""
    return json.dumps(
        {
            "directed": True,
            "multigraph": False,
            "graph": {},
            "nodes": [
                {"id": n["id"], "name": n["name"], "node_type": n["node_type"],
                 "mention_count": n["mention_count"]}
                for n in nodes
            ],
            "links": [
                {"source": e["source"], "target": e["target"],
                 "relation": e["relation"], "confidence": e["confidence"]}
                for e in edges
            ],
        },
        indent=2,
    )


def graph_to_jsonld(nodes, edges) -> str:
    """graph.rs JSON-LD layout (schema.org-ish @graph)."""
    rel_by_src: dict[str, list] = {}
    for e in edges:
        rel_by_src.setdefault(e["source"], []).append(
            {"relation_type": e["relation"], "target": e["target"]}
        )
    return json.dumps(
        {
            "@context": {"name": "http://schema.org/name", "relations": "http://schema.org/about"},
            "@graph": [
                {
                    "@id": n["id"],
                    "@type": n["node_type"],
                    "name": n["name"],
                    "relations": rel_by_src.get(n["id"], []),
                }
                for n in nodes
            ],
        },
        indent=2,
    )

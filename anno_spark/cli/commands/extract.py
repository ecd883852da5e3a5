"""`extract` — Level 1 (Signal) single-document NER.

Port of anno/src/cli/commands/extract.rs:89-423: input resolution →
optional preprocessing → backend extraction → label filter → grounded
doc with negation/quantifier tagging → format dispatch → optional file
export and graph export.
"""

from __future__ import annotations

import json
import os
import sys
import time

from ...core import relations as relations_mod
from ...core import textops
from ..backends import create_model
from ..errors import CliError
from ..grounded import (
    GroundedDoc,
    build_graph,
    graph_to_cypher,
    graph_to_jsonld,
    graph_to_networkx_json,
)
from ..output import color, log_info, print_annotated_signals, print_signals
from ..utils import get_input_text


def run(args):
    if getattr(args, "url", None):
        # extract.rs:97-112 — URL fetch is a network feature; the engine's
        # input contract is pre-crawled pages (SURVEY §2.1 S2 n/a).
        raise CliError(
            f"Failed to fetch URL {args.url}: URL resolution is not available; "
            "this engine ingests pre-crawled pages (use -f/-t or stdin)."
        )

    raw_text = get_input_text(args.text, args.file, args.positional)

    # extract.rs:118-133 — preprocessing flags
    if args.clean or args.normalize or args.detect_lang:
        prepared = textops.prepare(raw_text, clean=args.clean, normalize=args.normalize)
        meta = {}
        if args.detect_lang:
            meta["language"] = textops.detect_language(prepared)
        raw_text = prepared
        if args.verbose and meta:
            log_info(f"Preprocessing metadata: {meta}", args.quiet)

    text = raw_text
    model = create_model(args.model)

    start_t = time.perf_counter()
    mentions = model(text)
    elapsed_ms = (time.perf_counter() - start_t) * 1000.0

    # extract.rs:144-156 — label filter (case-insensitive)
    if args.labels:
        wanted = {l.lower() for l in args.labels}
        mentions = [m for m in mentions if m.entity_type.lower() in wanted]

    doc = GroundedDoc("extract", text)
    validation_errors = doc.add_mentions(
        mentions, negation=args.negation, quantifiers=args.quantifiers
    )
    if validation_errors and not args.quiet:
        print(
            f"{color('33', 'warning:')} {len(validation_errors)} validation errors:",
            file=sys.stderr,
        )
        for err in validation_errors:
            print(f"  - {err}", file=sys.stderr)

    _emit(args, doc, text, elapsed_ms)

    # extract.rs:322-389 — export GroundedDocument JSON
    if args.export:
        if args.export_format not in ("full", "signals", "minimal"):
            raise CliError(
                f"Invalid export format '{args.export_format}'. Use: full, signals, or minimal"
            )
        parent = os.path.dirname(args.export)
        if parent and not os.path.isdir(parent):
            os.makedirs(parent, exist_ok=True)
        with open(args.export, "w", encoding="utf-8") as f:
            f.write(doc.to_json(args.export_format))
        if not args.quiet:
            print(
                f"{color('32', 'ok:')} Exported {args.export_format} format to {args.export}",
                file=sys.stderr,
            )

    # extract.rs:391-420 — graph export to stdout
    if args.export_graph:
        fmt = args.export_graph.lower()
        if fmt in ("neo4j", "cypher"):
            render = graph_to_cypher
        elif fmt in ("networkx", "nx"):
            render = graph_to_networkx_json
        elif fmt in ("jsonld", "json-ld"):
            render = graph_to_jsonld
        else:
            raise CliError(
                f"Invalid graph format '{args.export_graph}'. Use: neo4j, networkx, or jsonld"
            )
        kept = [m for m in mentions]
        triples = relations_mod.extract_relations(kept, text)
        nodes, edges = build_graph(doc, triples)
        if not args.quiet:
            print(
                f"{color('32', 'ok:')} Exported graph ({len(nodes)} nodes, "
                f"{len(edges)} edges) in {args.export_graph} format",
                file=sys.stderr,
            )
        print(render(nodes, edges))


def _emit(args, doc: GroundedDoc, text: str, elapsed_ms: float):
    """extract.rs:207-320 — format dispatch."""
    fmt = args.format
    if fmt == "json":
        out = [
            {
                "text": s["surface"],
                "type": s["label"],
                "start": s["start"],
                "end": s["end"],
                "confidence": s["confidence"],
                "negated": s["negated"],
                "quantifier": s["quantifier"],
            }
            for s in doc.signals
        ]
        print(json.dumps(out, indent=2, ensure_ascii=False))
    elif fmt == "jsonl":
        for s in doc.signals:
            print(
                json.dumps(
                    {
                        "text": s["surface"],
                        "type": s["label"],
                        "start": s["start"],
                        "end": s["end"],
                        "confidence": s["confidence"],
                    },
                    ensure_ascii=False,
                )
            )
    elif fmt == "tsv":
        print("start\tend\ttype\tconfidence\tnegated\ttext")
        for s in doc.signals:
            print(
                f"{s['start']}\t{s['end']}\t{s['label']}\t{s['confidence']:.2f}\t"
                f"{str(s['negated']).lower()}\t{s['surface']}"
            )
    elif fmt == "grounded":
        print(doc.to_json("full"))
    elif fmt == "html":
        raise CliError(
            "HTML format not supported for extract command. Use 'debug --format html' instead."
        )
    elif fmt in ("tree", "summary"):
        raise CliError("Tree/Summary formats are only available for cross-doc command.")
    elif fmt == "inline":
        print_annotated_signals(text, doc.signals)
    else:  # human
        if args.quiet:
            for s in doc.signals:
                neg = " [NEG]" if s["negated"] else ""
                quant = f" [{s['quantifier']}]" if s["quantifier"] else ""
                print(f"[{s['start']},{s['end']})\t{s['label']}\t{s['surface']}{neg}{quant}")
        else:
            stats = doc.stats()
            print()
            print(
                f"{color('32', 'ok:')} extracted {stats['signal_count']} entities in "
                f"{elapsed_ms:.1f}ms (model: {args.model}, avg confidence: "
                f"{stats['avg_confidence']:.2f}, tracks: {stats['track_count']}, "
                f"identities: {stats['identity_count']})"
            )
            print()
            if not doc.signals:
                print("  (no entities found)")
            else:
                print_signals(doc.signals, text, not args.quiet)
            print()
            print_annotated_signals(text, doc.signals)

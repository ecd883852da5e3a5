"""`query` — filter signals in a GroundedDocument or cross-doc clusters.

Port of anno/src/cli/commands/query.rs:71-241.
"""

from __future__ import annotations

import json
import sys

from ..errors import CliError
from ..grounded import from_dict
from ..output import write_output
from ..utils import read_input_file


def run(args):
    if args.input == "-":
        content = sys.stdin.read()
    else:
        content = read_input_file(args.input)

    try:
        data = json.loads(content)
    except json.JSONDecodeError as e:
        raise CliError(f"Failed to parse input JSON: {e}") from e

    if isinstance(data, dict) and ("signals" in data or "entities" in data or "text" in data):
        _query_document(args, data)
    elif isinstance(data, list):
        _query_clusters(args, data)
    else:
        raise CliError(
            "Failed to parse input as GroundedDocument or cross-doc clusters"
        )


def _query_document(args, data: dict):
    """query.rs:84-168 — signal-level filters."""
    doc = from_dict(data)
    signals = list(doc.signals)

    if args.type:
        signals = [s for s in signals if s["label"].lower() == args.type.lower()]
    if args.start_offset is not None and args.end_offset is not None:
        signals = [
            s for s in signals
            if s["start"] < args.end_offset and s["end"] > args.start_offset
        ]
    if args.min_confidence is not None:
        signals = [s for s in signals if s["confidence"] >= args.min_confidence]
    if args.entity:
        needle = args.entity.lower()
        signals = [s for s in signals if needle in s["surface"].lower()]
    if args.negated:
        signals = [s for s in signals if s.get("negated")]
    if args.quantified:
        signals = [s for s in signals if s.get("quantifier")]

    tracked_ids = {sid for t in doc.tracks for sid in t.get("signal_ids", [])}
    linked_track_ids = {
        tid for i in doc.identities for tid in i.get("track_ids", [])
    }
    linked_ids = {
        sid for t in doc.tracks if t["id"] in linked_track_ids
        for sid in t.get("signal_ids", [])
    }
    if args.untracked:
        signals = [s for s in signals if s["id"] not in tracked_ids]
    if args.linked:
        signals = [s for s in signals if s["id"] in linked_ids]
    if args.unlinked:
        signals = [s for s in signals if s["id"] not in linked_ids]

    if args.format in ("json", "grounded"):
        write_output(
            json.dumps(signals, indent=2, ensure_ascii=False) + "\n", args.output
        )
    else:
        print(f"Found {len(signals)} entities:")
        for s in signals:
            print(
                f"  [{s['start']}:{s['end']}] {s['surface']} ({s['label']}) "
                f"- {s['confidence']:.2f}"
            )


def _query_clusters(args, clusters: list):
    """query.rs:169-235 — cluster-level filters."""
    filtered = list(clusters)
    if args.type:
        filtered = [
            c for c in filtered
            if (c.get("entity_type") or "").lower() == args.type.lower()
        ]
    if args.entity:
        needle = args.entity.lower()
        filtered = [
            c for c in filtered if needle in (c.get("canonical_name") or "").lower()
        ]

    if args.format == "tree":
        for c in filtered:
            print(f"Cluster {c.get('id')}: {c.get('canonical_name')}")
            for doc_id, entity_idx in c.get("mentions", []):
                print(f"  - entity[{entity_idx}] (doc: {doc_id})")
            print()
    elif args.format in ("json", "grounded"):
        write_output(
            json.dumps(filtered, indent=2, ensure_ascii=False) + "\n", args.output
        )
    else:
        print(f"Found {len(filtered)} clusters:")
        for c in filtered:
            print(
                f"  {c.get('canonical_name')}: {len(c.get('mentions', []))} mentions "
                f"across {len(c.get('documents', []))} documents"
            )

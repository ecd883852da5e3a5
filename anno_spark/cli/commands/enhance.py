"""`enhance` — re-process an existing GroundedDocument (coref, KB link).

Port of anno/src/cli/commands/enhance.rs:49-206.
"""

from __future__ import annotations

import json
import os
import sys

from ...core.entity import Mention
from ..errors import CliError
from ..grounded import from_dict
from ..output import color, print_signals
from ..utils import read_input_file


def run(args):
    content = sys.stdin.read() if args.input == "-" else read_input_file(args.input)
    try:
        doc = from_dict(json.loads(content))
    except json.JSONDecodeError as e:
        raise CliError(f"Failed to parse GroundedDocument JSON: {e}") from e

    if args.coref:
        # rebuild tracks from the existing signals via the production
        # coref core (utils.rs resolve_coreference over loaded signals)
        mentions = [
            Mention(s["surface"], s["label"], s["start"], s["end"],
                    s["confidence"], "import", "import")
            for s in doc.signals
        ]
        doc.signals = []
        doc.tracks = []
        doc.run_coref(mentions)
        if not args.quiet:
            print(f"{color('32', 'ok:')} Applied coreference resolution",
                  file=sys.stderr)

    if args.link_kb:
        doc.identities = []
        doc.link_kb()
        if not args.quiet:
            print(f"{color('32', 'ok:')} Applied KB linking", file=sys.stderr)

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

    if args.format in ("json", "grounded"):
        print(doc.to_json("full"))
    elif args.format == "human":
        if not args.quiet:
            stats = doc.stats()
            print()
            print(color("1;36", "Enhanced Document"))
            print(f"  Signals: {stats['signal_count']}")
            print(f"  Tracks: {stats['track_count']}")
            print(f"  Identities: {stats['identity_count']}")
            print()
        print_signals(doc.signals, doc.text, False)
    else:
        raise CliError(f"Format '{args.format}' not supported for enhance command")

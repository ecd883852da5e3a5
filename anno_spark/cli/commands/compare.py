"""`compare` — compare models on a text, or diff two GroundedDocuments.

Port of anno/src/cli/commands/compare.rs:38-147.
"""

from __future__ import annotations

import json

from ..backends import BACKENDS
from ..errors import CliError
from ..grounded import from_dict
from ..utils import read_input_file


def run(args):
    if args.models:
        text = read_input_file(args.file1)
        if not args.model_list:
            raise CliError("--models requires --model-list with model names")

        results = []
        for name in args.model_list:
            extract = BACKENDS.get(name)
            if extract is None:
                raise CliError(f"Unknown model: {name}")
            results.append((name, extract(text)))

        if args.format == "table":
            print("\nModel Comparison:")
            print(f"{'Model':<15} {'Entities':<10}")
            print("-" * 25)
            for name, mentions in results:
                print(f"{name:<15} {len(mentions):<10}")
        else:
            for name, mentions in results:
                print(f"\n{name} ({len(mentions)} entities):")
                for m in mentions:
                    print(f"  - {m.text} ({m.entity_type})")
        return

    # compare.rs:88-144 — two-document diff on (surface, label, confidence)
    if not args.file2:
        raise CliError("Second file required for document comparison")
    try:
        doc1 = from_dict(json.loads(read_input_file(args.file1)))
        doc2 = from_dict(json.loads(read_input_file(args.file2)))
    except json.JSONDecodeError as e:
        raise CliError(f"Failed to parse: {e}") from e

    def keys(doc):
        return {
            f"{s['surface']}:{s['label']}:{s['confidence']}" for s in doc.signals
        }

    sig1, sig2 = keys(doc1), keys(doc2)
    only1 = sorted(sig1 - sig2)
    only2 = sorted(sig2 - sig1)
    both = sig1 & sig2

    if args.format == "summary":
        print("\nComparison Summary:")
        print(f"  {args.file1}: {len(doc1.signals)} entities")
        print(f"  {args.file2}: {len(doc2.signals)} entities")
        print(f"  Common: {len(both)}")
        print(f"  Only in {args.file1}: {len(only1)}")
        print(f"  Only in {args.file2}: {len(only2)}")
    else:  # diff (default)
        print(f"\nComparison: {args.file1} vs {args.file2}")
        print(f"\nOnly in {args.file1}: {len(only1)}")
        for s in only1:
            print(f"  + {s}")
        print(f"\nOnly in {args.file2}: {len(only2)}")
        for s in only2:
            print(f"  - {s}")
        print(f"\nIn both: {len(both)}")

"""`batch` — batch process many documents.

Port of anno/src/cli/commands/batch.rs:54-226: directory mode delegates
to the pipeline command; stdin mode reads JSONL {"id": ..., "text": ...}
rows.  Where the reference stubs ``--parallel`` ("not yet implemented"),
this engine maps it onto the real thing: ``--parallel N`` (N > 1) or
``--spark`` routes extraction through the distributed mapInPandas
extractor.
"""

from __future__ import annotations

import argparse
import json
import sys

from ..errors import CliError
from . import pipeline as pipeline_cmd


def run(args):
    if not args.dir and not args.stdin:
        raise CliError("Either --dir <DIR> or --stdin must be specified")
    if args.dir and args.stdin:
        raise CliError("Cannot use both --dir and --stdin. Choose one.")

    texts: list[tuple[str, str]] = []
    if args.stdin:
        if not args.quiet:
            print("Reading JSONL from stdin...", file=sys.stderr)
        for line_num, line in enumerate(sys.stdin, start=1):
            if not line.strip():
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError as e:
                raise CliError(
                    f"Failed to parse stdin line {line_num} as JSON: {e}"
                ) from e
            text = obj.get("text")
            if not isinstance(text, str):
                raise CliError(f"Missing 'text' field in stdin line {line_num}")
            texts.append((obj.get("id") or f"stdin:{line_num}", text))

    use_spark = args.spark or args.parallel > 1
    pipeline_args = argparse.Namespace(
        text=[], files=[], dir=args.dir, model=args.model,
        coref=args.coref, link_kb=args.link_kb, cross_doc=False,
        threshold=0.6, format=args.format, output=args.output,
        progress=args.progress, spark=use_spark, quiet=args.quiet,
    )

    if args.stdin:
        # batch.rs:131-221 — process the JSONL rows directly
        from ..grounded import GroundedDoc
        from ..output import color, print_signals
        from .pipeline import _extract_all, _sink

        pipeline_args.text = None
        mention_lists = _extract_all(texts, pipeline_args)
        documents = []
        for (doc_id, text), mentions in zip(texts, mention_lists):
            doc = GroundedDoc(doc_id, text)
            if args.coref:
                doc.run_coref(mentions)
            else:
                doc.add_mentions(mentions)
            if args.link_kb:
                doc.link_kb()
            documents.append(doc)
            if args.progress and not args.quiet:
                print(f"Processed {doc_id}", file=sys.stderr)

        if args.format in ("json", "grounded"):
            out = json.dumps([d.to_dict("full") for d in documents],
                             indent=2, ensure_ascii=False)
            _sink(out + "\n", args.output)
        else:
            for doc in documents:
                if not args.quiet:
                    print(f"\n{color('1;36', f'Document: {doc.id}')}")
                print_signals(doc.signals, doc.text, False)
        return

    pipeline_cmd.run(pipeline_args)

"""`pipeline` — extract → coref → KB link (→ cross-doc) over many inputs.

Port of anno/src/cli/commands/pipeline.rs:63-300.  ``--spark`` routes
extraction through the distributed fused extractor, the same substitution
the crossdoc command makes.
"""

from __future__ import annotations

import json
import os
import sys

from ...eval.cdcr_data import CDCRConfig, CDCRResolver, Document, Entity
from ..backends import create_model
from ..errors import CliError
from ..grounded import GroundedDoc
from ..output import color, print_signals


def run(args):
    # pipeline.rs:64-111 — collect (doc_id, text) inputs
    texts: list[tuple[str, str]] = []
    for idx, text in enumerate(args.text or [], start=1):
        texts.append((f"text{idx}", text))
    for path in args.files or []:
        try:
            with open(path, encoding="utf-8") as f:
                content = f.read()
        except OSError as e:
            raise CliError(f"Failed to read {path}: {e}") from e
        stem = os.path.splitext(os.path.basename(path))[0] or path
        texts.append((stem, content))
    if args.dir:
        try:
            entries = sorted(os.listdir(args.dir))
        except OSError as e:
            raise CliError(f"Failed to read directory {args.dir}: {e}") from e
        for name in entries:
            path = os.path.join(args.dir, name)
            ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            if os.path.isfile(path) and ext in ("txt", "md"):
                with open(path, encoding="utf-8") as f:
                    content = f.read()
                stem = os.path.splitext(name)[0] or f"doc{len(texts)}"
                texts.append((stem, content))

    if not texts:
        raise CliError("No input provided. Use --text, --files, or --dir")

    # pipeline.rs:113-176 — extract per doc, then enhance
    documents: list[GroundedDoc] = []
    mention_lists = _extract_all(texts, args)
    for (doc_id, text), mentions in zip(texts, mention_lists):
        doc = GroundedDoc(doc_id, text)
        if args.coref:
            doc.run_coref(mentions)  # appends pronoun signals + tracks
            # run_coref adds ALL signals (ner + pronouns); ner first
        else:
            doc.add_mentions(mentions)
        if args.link_kb:
            doc.link_kb()
        documents.append(doc)
        if args.progress and not args.quiet:
            print(f"Processed {doc_id}", file=sys.stderr)

    if args.cross_doc:
        # pipeline.rs:184-268 — CDCR over signal-level mentions
        cdcr_docs = [
            Document(
                doc.id,
                doc.text,
                [
                    Entity(s["surface"], s["label"], s["start"], s["end"], s["confidence"])
                    for s in doc.signals
                    if s["label"] != "PRON"
                ],
            )
            for doc in documents
        ]
        config = CDCRConfig(min_similarity=args.threshold, require_type_match=False)
        clusters = CDCRResolver.with_config(config).resolve(cdcr_docs)

        if args.format in ("json", "grounded"):
            out = json.dumps([c.to_json() for c in clusters], indent=2, ensure_ascii=False)
            _sink(out + "\n", args.output)
        elif args.format == "tree":
            doc_index = {d.id: d for d in cdcr_docs}
            lines = []
            for c in clusters:
                lines.append(f"Cluster {c.id}: {c.canonical_name}")
                for doc_id, entity_idx in c.mentions:
                    d = doc_index.get(doc_id)
                    mention_text = (
                        d.entities[entity_idx].text
                        if d is not None and entity_idx < len(d.entities)
                        else f"entity_{entity_idx}"
                    )
                    lines.append(f"  - {mention_text} (doc: {doc_id})")
                lines.append("")
            _sink("\n".join(lines) + "\n", args.output)
        else:
            print()
            print(f"{color('1;36', 'Found')} Cross-document clusters: {len(clusters)}")
            for c in clusters:
                print(
                    f"  {c.canonical_name}: {len(c.mentions)} mentions "
                    f"across {c.doc_count()} documents"
                )
    else:
        # pipeline.rs:276-297 — per-document output
        if args.format in ("json", "grounded"):
            out = json.dumps(
                [d.to_dict("full") for d in documents], indent=2, ensure_ascii=False
            )
            _sink(out + "\n", args.output)
        else:
            for doc in documents:
                print()
                print(color("1;36", f"Document: {doc.id}"))
                print_signals(doc.signals, doc.text, False)


def _extract_all(texts, args):
    """→ list[list[Mention]] aligned with ``texts``."""
    if args.spark:
        from ...core.entity import Mention
        from ...operators.extract import extract_documents, mentions_table
        from ...session import get_spark

        spark = get_spark(app_name="anno-cli-pipeline")
        df = spark.createDataFrame(texts, "url string, text string")
        rows = (
            mentions_table(extract_documents(df))
            .select("url", "mention_idx", "text", "entity_type", "start", "end",
                    "confidence", "pattern", "source")
            .collect()
        )
        by_doc = {doc_id: [] for doc_id, _ in texts}
        for r in rows:
            by_doc[r["url"]].append(
                (r["mention_idx"],
                 Mention(r["text"], r["entity_type"], r["start"], r["end"],
                         r["confidence"], r["pattern"], r["source"]))
            )
        return [
            [m for _, m in sorted(by_doc[doc_id], key=lambda t: t[0])]
            for doc_id, _ in texts
        ]
    model = create_model(args.model)
    return [model(text) for _, text in texts]


def _sink(content: str, path: str | None):
    if path:
        try:
            with open(path, "w", encoding="utf-8") as f:
                f.write(content)
        except OSError as e:
            raise CliError(f"Failed to write output: {e}") from e
    else:
        sys.stdout.write(content)

"""`crossdoc` (alias `coalesce`) — cross-document entity coalescing.

Port of anno/src/cli/commands/crossdoc.rs:85-1170: two input modes
(directory of text files → extract → CDCR; --import / --stdin of
GroundedDocument JSON → cluster pre-extracted signals), shared filters
(min cluster size, cross-doc-only, entity types, max clusters), four
output formats (json with metadata, jsonl, tree, summary), -o file sink.

``--spark`` routes the corpus-proportional stage (per-file extraction)
through the distributed fused mapInPandas extractor
(operators/extract.py) instead of the in-process loop; clustering runs
on the collected mention table (mentions ≪ corpus, the reference's own
CDCR shape).  For true web-scale resolution use the kg pipeline
(plans/pipeline.py), which keeps resolution distributed end-to-end.
"""

from __future__ import annotations

import glob as glob_mod
import json
import os
import sys

from ...eval.cdcr_data import CDCRConfig, CDCRResolver, CrossDocCluster, Document, Entity
from ..backends import create_model
from ..errors import CliError
from ..grounded import from_dict
from ..output import color
from ..utils import collect_text_files

# Single-process ceiling: past this, the right tool is the distributed
# pipeline, not a bigger driver heap (see the guard in run()).
CROSSDOC_MAX_FILES = 10_000
CROSSDOC_MAX_BYTES = 1 << 30


def run(args):
    verbose = args.verbose

    imported_docs = None
    if args.import_paths or args.stdin:
        documents, doc_paths, imported_docs = _load_imported(args)
    else:
        documents, doc_paths = _extract_directory(args)

    if not documents:
        raise CliError("No GroundedDocuments imported. Check import paths or stdin input.")

    if verbose:
        total = sum(len(d.entities) for d in documents)
        print(
            f"Clustering {total} entities across {len(documents)} documents...",
            file=sys.stderr,
        )

    track_docs = [g for g in (imported_docs or []) if g.tracks]
    if track_docs:
        # crossdoc.rs:442-507 import mode: Level-2 tracks exist, so
        # clustering runs at track level via the coalesce Resolver
        # (coalesce/src/resolver.rs — word-set Jaccard / embedding cosine),
        # and imported docs WITHOUT tracks contribute nothing (the
        # reference's Corpus path only iterates tracks — quirk kept).
        if verbose:
            print(
                f"Resolving inter-document coreference (threshold: "
                f"{args.threshold}, require_type_match: "
                f"{args.require_type_match})...",
                file=sys.stderr,
            )
        clusters = _resolve_tracks(track_docs, args)
        if verbose:
            print(f"Created {len(clusters)} identities from inter-doc coref",
                  file=sys.stderr)
    else:
        # crossdoc.rs:617-625 — LSH for large document sets only
        config = CDCRConfig(
            min_similarity=args.threshold,
            require_type_match=args.require_type_match,
            use_lsh=len(documents) > 100,
        )
        clusters = CDCRResolver.with_config(config).resolve(documents)

    # crossdoc.rs:628-656 — filters
    filtered = []
    for c in clusters:
        if len(c) < args.min_cluster_size:
            continue
        if args.cross_doc_only and c.doc_count() <= 1:
            continue
        if args.entity_types:
            if c.entity_type is None:
                continue
            wanted = {t.upper() for t in args.entity_types}
            if c.entity_type.upper() not in wanted:
                continue
        filtered.append(c)

    # crossdoc.rs:659-664 — sort by (doc_count desc, size desc, name desc)
    filtered.sort(key=lambda c: (-c.doc_count(), -len(c), _neg_str(c.canonical_name)))
    if args.max_clusters > 0:
        filtered = filtered[: args.max_clusters]

    output_text = _format(args, filtered, documents, doc_paths)

    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(output_text)
        if verbose:
            print(f"Output written to: {args.output}", file=sys.stderr)
    else:
        sys.stdout.write(output_text)


class _neg_str(str):
    """Descending string sort key inside an ascending tuple sort."""

    def __lt__(self, other):  # noqa: D105
        return str.__gt__(self, other)


# ---------------------------------------------------------------------------
# input modes
# ---------------------------------------------------------------------------


def _resolve_tracks(track_docs, args):
    """crossdoc.rs:451-507 — coalesce Resolver over imported tracks,
    identities re-packed as CrossDocClusters (one mention per signal in
    each member track, positions as entity indices — the reference's own
    approximation)."""
    from ...core.coalesce import Resolver, TrackData

    tracks = []
    track_index = {}
    for gdoc in track_docs:
        for t in gdoc.tracks:
            tracks.append(
                TrackData(
                    doc_id=gdoc.id,
                    track_id=t["id"],
                    canonical_surface=t["canonical_surface"],
                    entity_type=t.get("entity_type"),
                    cluster_confidence=float(t.get("cluster_confidence", 1.0)),
                    embedding=t.get("embedding"),
                )
            )
            track_index[(gdoc.id, t["id"])] = t

    identities = (
        Resolver.new()
        .with_threshold(args.threshold)
        .require_type_match(args.require_type_match)
        .resolve_inter_doc_coref(tracks)
    )
    clusters = []
    for ident in identities:
        c = CrossDocCluster(ident.id, ident.canonical_name,
                            entity_type=ident.entity_type,
                            confidence=ident.confidence)
        for doc_id, track_id in ident.track_refs:
            t = track_index[(doc_id, track_id)]
            for pos in range(len(t.get("signal_ids", []))):
                c.add_mention(doc_id, pos)
        clusters.append(c)
    return clusters


def _load_imported(args):
    """crossdoc.rs:245-440 — GroundedDocument JSON files / globs / stdin."""
    documents: list[Document] = []
    doc_paths: dict[str, str] = {}
    grounded_docs: list = []

    def add_grounded(d: dict, source: str):
        gdoc = from_dict(d)
        grounded_docs.append(gdoc)
        # crossdoc.rs:178-243 load_grounded_doc_legacy: prefer tracks
        # (canonical mention per chain), else raw signals.
        if gdoc.tracks:
            sig_by_id = {s["id"]: s for s in gdoc.signals}
            entities = []
            for t in gdoc.tracks:
                first = next(
                    (sig_by_id[sid] for sid in t["signal_ids"] if sid in sig_by_id), None
                )
                if first is not None:
                    entities.append(
                        Entity(first["surface"], first["label"], first["start"],
                               first["end"], first["confidence"])
                    )
                else:
                    entities.append(Entity(t["canonical_surface"],
                                           t.get("entity_type") or "UNKNOWN", 0, 0, 1.0))
        else:
            entities = [
                Entity(s["surface"], s["label"], s["start"], s["end"], s["confidence"])
                for s in gdoc.signals
            ]
        documents.append(Document(gdoc.id or source, gdoc.text, entities))
        doc_paths[gdoc.id or source] = source

    if args.stdin:
        for line_num, line in enumerate(sys.stdin, start=1):
            if not line.strip():
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError as e:
                raise CliError(f"Failed to parse stdin line {line_num}: {e}") from e
            add_grounded(d, f"stdin:{line_num}")
            if args.verbose:
                print(f"  Imported document from stdin line {line_num}", file=sys.stderr)
        return documents, doc_paths, grounded_docs

    import_files: list[str] = []
    for pattern in args.import_paths:
        if pattern == "-":
            for line_num, line in enumerate(sys.stdin, start=1):
                if not line.strip():
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError as e:
                    raise CliError(f"Failed to parse stdin line {line_num}: {e}") from e
                add_grounded(d, f"stdin:{line_num}")
        elif any(ch in pattern for ch in "*?["):
            import_files.extend(p for p in sorted(glob_mod.glob(pattern)) if os.path.isfile(p))
        elif os.path.isfile(pattern):
            import_files.append(pattern)
        else:
            raise CliError(f"Import file not found: {pattern}")

    for path in import_files:
        try:
            with open(path, encoding="utf-8") as f:
                content = f.read()
        except OSError as e:
            raise CliError(f"Failed to read import file '{path}': {e}") from e
        try:
            d = json.loads(content)
        except json.JSONDecodeError as e:
            raise CliError(f"Failed to parse GroundedDocument JSON from '{path}': {e}") from e
        add_grounded(d, path)
        if args.verbose:
            print(f"  Loaded {os.path.basename(path)}", file=sys.stderr)

    return documents, doc_paths, grounded_docs


def _extract_directory(args):
    """crossdoc.rs:523-601 — scan directory, extract entities per file."""
    if not args.directory:
        raise CliError(
            "Directory is required when --import is not used. "
            "Use: crossdoc <DIR> or crossdoc --import <FILE>"
        )
    extensions = [e.strip().lower() for e in args.extensions.split(",")]
    files = collect_text_files(args.directory, extensions, args.recursive)
    if not files:
        raise CliError(f"No files found with extensions: {args.extensions}")
    if args.verbose:
        print(f"Found {len(files)} files", file=sys.stderr)
        print("Extracting entities...", file=sys.stderr)

    # Driver-residency guard (VERDICT r05 next #6): this command reads
    # every file onto the driver and (with --spark) collects every
    # mention back — faithful to the reference CLI's single-process UX,
    # but an unbounded directory would OOM the driver instead of failing
    # with a pointer at the distributed entry point.
    total_bytes = sum(os.path.getsize(p) for p in files)
    if len(files) > CROSSDOC_MAX_FILES or total_bytes > CROSSDOC_MAX_BYTES:
        raise CliError(
            f"crossdoc is a single-process tool capped at "
            f"{CROSSDOC_MAX_FILES} files / {CROSSDOC_MAX_BYTES >> 20} MiB "
            f"(got {len(files)} files / {total_bytes >> 20} MiB). For "
            f"corpus-scale cross-document resolution run the distributed "
            f"pipeline: scripts/run_pipeline.py (or "
            f"anno_spark.operators.resolve.resolve_mentions)."
        )

    named: list[tuple[str, str]] = []
    for idx, path in enumerate(files):
        try:
            with open(path, encoding="utf-8") as f:
                text = f.read()
        except OSError as e:
            raise CliError(f"Failed to read {path}: {e}") from e
        stem = os.path.splitext(os.path.basename(path))[0] or f"doc{idx}"
        named.append((stem, text))

    doc_paths = {stem: path for (stem, _), path in zip(named, files)}

    if args.spark:
        documents = _extract_with_spark(named, args)
    else:
        model = create_model(args.model)
        documents = []
        for stem, text in named:
            mentions = model(text)
            documents.append(
                Document(
                    stem,
                    text,
                    [
                        Entity(m.text, m.entity_type, m.start, m.end, m.confidence)
                        for m in mentions
                    ],
                )
            )
    if args.verbose:
        print(f"  Processed {len(documents)} files successfully", file=sys.stderr)
    return documents, doc_paths


def _extract_with_spark(named, args):
    """Distributed extraction: (doc_id, text) DF → fused mapInPandas NER
    (same UDF payload as the kg pipeline) → collected mention lists."""
    from ...operators.extract import extract_documents, mentions_table
    from ...session import get_spark

    spark = get_spark(app_name="anno-cli-crossdoc")
    df = spark.createDataFrame(named, "url string, text string")
    mentions = mentions_table(extract_documents(df)).select(
        "url", "mention_idx", "text", "entity_type", "start", "end", "confidence"
    )
    rows = mentions.collect()
    by_doc: dict[str, list] = {stem: [] for stem, _ in named}
    for r in rows:
        by_doc[r["url"]].append(
            (r["mention_idx"], Entity(r["text"], r["entity_type"], r["start"],
                                      r["end"], r["confidence"]))
        )
    # restore per-doc extraction order so entity_idx matches the local path
    for stem in by_doc:
        by_doc[stem] = [e for _, e in sorted(by_doc[stem], key=lambda t: t[0])]
    text_of = dict(named)
    return [Document(stem, text_of[stem], by_doc[stem]) for stem, _ in named]


# ---------------------------------------------------------------------------
# output formats
# ---------------------------------------------------------------------------


def _format(args, clusters: list[CrossDocCluster], documents, doc_paths) -> str:
    fmt = args.format
    if fmt == "json":
        return _format_json(args, clusters, documents)
    if fmt == "jsonl":
        return "\n".join(json.dumps(c.to_json(), ensure_ascii=False) for c in clusters) + (
            "\n" if clusters else ""
        )
    if fmt == "tree":
        return _format_tree(args, clusters, documents, doc_paths)
    if fmt == "summary":
        return _format_summary(args, clusters, documents)
    raise CliError(
        f"Format '{fmt}' not supported for cross-doc command. "
        "Use: json, jsonl, tree, or summary."
    )


def _format_json(args, clusters, documents) -> str:
    """crossdoc.rs:686-723 — clusters + run metadata envelope."""
    total_entities = sum(len(d.entities) for d in documents)
    out = {
        "metadata": {
            "documents_processed": len(documents),
            "total_entities": total_entities,
            "clusters_found": len(clusters),
            "cross_document_clusters": sum(1 for c in clusters if c.doc_count() > 1),
            "threshold": args.threshold,
            "require_type_match": args.require_type_match,
            "filters": {
                "min_cluster_size": args.min_cluster_size,
                "cross_doc_only": args.cross_doc_only,
                "entity_types": args.entity_types,
                "max_clusters": args.max_clusters,
            },
        },
        "clusters": [c.to_json() for c in clusters],
    }
    return json.dumps(out, indent=2, ensure_ascii=False) + "\n"


def _format_tree(args, clusters, documents, doc_paths) -> str:
    """crossdoc.rs:733-1034 — human tree with summary header."""
    doc_index = {d.id: d for d in documents}
    lines: list[str] = []
    lines.append(color("1;36", "Cross-Document Entity Coalescing Results"))
    lines.append("")

    total_entities = sum(len(d.entities) for d in documents)
    cross_doc = sum(1 for c in clusters if c.doc_count() > 1)
    lines.append(color("1;33", "Summary"))
    lines.append(f"  Documents: {len(documents)}")
    lines.append(f"  Entities: {total_entities}")
    lines.append(
        f"  Clusters: {len(clusters)} ({color('32', str(cross_doc))} cross-doc, "
        f"{len(clusters) - cross_doc} singleton)"
    )
    if args.entity_types:
        lines.append(f"  Filtered by: {', '.join(args.entity_types)}")
    lines.append("")

    type_counts: dict[str, int] = {}
    for c in clusters:
        if c.entity_type:
            type_counts[c.entity_type] = type_counts.get(c.entity_type, 0) + 1
    if type_counts:
        lines.append(color("1;33", "Entity Types"))
        for etype, count in sorted(type_counts.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {etype}: {count}")
        lines.append("")

    lines.append(color("1;36", "Clusters"))
    lines.append("")

    if args.max_clusters > 0:
        display_limit = args.max_clusters
    elif not args.verbose:
        display_limit = 50
    else:
        display_limit = len(clusters)

    for c in clusters[:display_limit]:
        is_cross = c.doc_count() > 1
        prefix = color("32", "*") if is_cross else color("90", "o")
        header = f"{prefix} {color('1', c.canonical_name)}"
        if c.entity_type:
            header += f" ({c.entity_type})"
        if is_cross:
            header += f" {color('32', '[cross-doc]')}"
        lines.append(header)

        meta = [f"{len(c)} mentions", f"{c.doc_count()} doc{'' if c.doc_count() == 1 else 's'}"]
        if c.confidence < 1.0:
            meta.append(f"conf: {c.confidence:.2f}")
        lines.append(f"  {' - '.join(meta)}")
        if c.kb_id:
            lines.append(f"  KB: {color('36', c.kb_id)}")

        if c.documents:
            max_docs = 20 if args.verbose else 5
            shown = [
                color("36", f"{d} ({doc_paths[d]})" if d in doc_paths else d)
                for d in c.documents[:max_docs]
            ]
            if len(c.documents) > max_docs:
                lines.append(
                    f"  Docs: {', '.join(shown)} (and {len(c.documents) - max_docs} more)"
                )
            else:
                lines.append(f"  Docs: {', '.join(shown)}")

        if c.mentions:
            sample = len(c.mentions) if args.verbose else min(len(c.mentions), 3)
            for doc_id, entity_idx in c.mentions[:sample]:
                doc = doc_index.get(doc_id)
                if doc is not None and entity_idx < len(doc.entities):
                    e = doc.entities[entity_idx]
                    lines.append(
                        f"    {color('90', '-')} {color('36', doc_id)}: \"{e.text}\""
                    )
            if len(c.mentions) > sample:
                lines.append(
                    f"    {color('90', '-')} ... and {len(c.mentions) - sample} more"
                )
        lines.append("")

    if len(clusters) > display_limit:
        more = len(clusters) - display_limit
        lines.append(
            color(
                "90",
                f"... {more} more cluster{'' if more == 1 else 's'} "
                f"(use --max-clusters {len(clusters)} or --verbose to see all)",
            )
        )
    return "\n".join(lines) + "\n"


def _format_summary(args, clusters, documents) -> str:
    """crossdoc.rs:1036-1139 — statistics block."""
    total_entities = sum(len(d.entities) for d in documents)
    cross_doc = sum(1 for c in clusters if c.doc_count() > 1)
    singleton = len(clusters) - cross_doc
    avg_size = (sum(len(c) for c in clusters) / len(clusters)) if clusters else 0.0
    max_size = max((len(c) for c in clusters), default=0)
    max_docs = max((c.doc_count() for c in clusters), default=0)

    bar = "=" * 59
    lines = [
        color("1;36", bar),
        color("1;36", "  Cross-Document Entity Coalescing Summary"),
        color("1;36", bar),
        "",
        color("1;33", "Document Statistics:"),
        f"  Documents processed: {len(documents)}",
        f"  Total entities extracted: {total_entities}",
        f"  Average entities per document: "
        f"{(total_entities / len(documents)) if documents else 0.0:.1f}",
        "",
        color("1;33", "Cluster Statistics:"),
        f"  Total clusters: {len(clusters)}",
        f"  Cross-document clusters: {cross_doc} "
        f"({(cross_doc / len(clusters) * 100) if clusters else 0.0:.1f}%)",
        f"  Singleton clusters: {singleton}",
        f"  Average cluster size: {avg_size:.2f} mentions",
        f"  Largest cluster: {max_size} mentions",
        f"  Most documents per cluster: {max_docs}",
        "",
    ]
    type_counts: dict[str, int] = {}
    for c in clusters:
        if c.entity_type:
            type_counts[c.entity_type] = type_counts.get(c.entity_type, 0) + 1
    if type_counts:
        lines.append(color("1;33", "Entity Type Distribution:"))
        for etype, count in sorted(type_counts.items(), key=lambda kv: -kv[1]):
            pct = count / len(clusters) * 100 if clusters else 0.0
            lines.append(f"  {etype}: {count} ({pct:.1f}%)")
    return "\n".join(lines) + "\n"

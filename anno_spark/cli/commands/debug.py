"""`debug` — Level 1+2(+3) extraction with optional HTML visualization.

Port of anno/src/cli/commands/debug.rs:16-341: extract → optional coref
tracks → optional KB identities; text output (grouped signals + inline
annotations) or ``--html`` (a self-contained report in the spirit of
anno-core's render_document_html: highlighted spans, track and identity
tables).
"""

from __future__ import annotations

import html as html_mod
import os
import sys
import time

from ...core import textops
from ..backends import create_model
from ..errors import CliError
from ..grounded import GroundedDoc
from ..output import color, print_annotated_signals, print_signals, write_output
from ..utils import get_input_text

_HTML_COLORS = {
    "PER": "#cfe2ff", "ORG": "#d1e7dd", "LOC": "#fff3cd", "DATE": "#e2d9f3",
    "TIME": "#e2d9f3", "MONEY": "#cff4fc", "PERCENT": "#cff4fc",
    "EMAIL": "#f8d7da", "URL": "#f8d7da", "PHONE": "#f8d7da", "PRON": "#e9ecef",
}


def run(args):
    if getattr(args, "url", None):
        raise CliError(
            f"Failed to fetch URL {args.url}: URL resolution is not available; "
            "this engine ingests pre-crawled pages (use -f/-t or stdin)."
        )
    raw_text = get_input_text(args.text, args.file, args.positional)
    if args.clean or args.normalize:
        raw_text = textops.prepare(raw_text, clean=args.clean, normalize=args.normalize)
    if args.detect_lang and args.verbose:
        print(f"Language: {textops.detect_language(raw_text)}", file=sys.stderr)

    text = raw_text
    model = create_model(args.model)
    start_t = time.perf_counter()
    mentions = model(text)
    elapsed_ms = (time.perf_counter() - start_t) * 1000.0

    doc = GroundedDoc("debug", text)
    if args.coref:
        doc.run_coref(mentions)
    else:
        doc.add_mentions(mentions)
    if args.link_kb:
        doc.link_kb()

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
            print(f"{color('32', 'ok:')} Exported to {args.export}", file=sys.stderr)

    if args.html:
        write_output(render_document_html(doc), args.output)
    else:
        stats = doc.stats()
        if not args.quiet:
            print()
            print(
                f"{color('32', 'ok:')} {stats['signal_count']} signals, "
                f"{stats['track_count']} tracks, {stats['identity_count']} identities "
                f"in {elapsed_ms:.1f}ms (model: {args.model})"
            )
            print()
        print_signals(doc.signals, text, not args.quiet)
        print_annotated_signals(text, doc.signals)
        if doc.tracks and not args.quiet:
            print()
            print(f"{color('1;33', 'Tracks')}:")
            for t in doc.tracks:
                print(
                    f"  #{t['id']} {t['canonical_surface']} ({t['entity_type']}) "
                    f"- {len(t['signal_ids'])} signals"
                )
        if doc.identities and not args.quiet:
            print()
            print(f"{color('1;33', 'Identities')}:")
            for i in doc.identities:
                kb = f" [{i['kb_id']}]" if i.get("kb_id") else ""
                print(f"  #{i['id']} {i['canonical_name']}{kb}")

    if args.export_graph:
        from ...core import relations as relations_mod
        from ..grounded import (
            build_graph,
            graph_to_cypher,
            graph_to_jsonld,
            graph_to_networkx_json,
        )

        fmt = args.export_graph.lower()
        render = {
            "neo4j": graph_to_cypher, "cypher": graph_to_cypher,
            "networkx": graph_to_networkx_json, "nx": graph_to_networkx_json,
            "jsonld": graph_to_jsonld, "json-ld": graph_to_jsonld,
        }.get(fmt)
        if render is None:
            raise CliError(
                f"Invalid graph format '{args.export_graph}'. Use: neo4j, networkx, or jsonld"
            )
        triples = relations_mod.extract_relations(mentions, text)
        nodes, edges = build_graph(doc, triples)
        print(render(nodes, edges))


def render_document_html(doc: GroundedDoc) -> str:
    """Self-contained HTML report (grounded.rs render_document_html
    shape): span-highlighted text + signal/track/identity tables."""
    chars = list(doc.text)
    sorted_sigs = sorted(doc.signals, key=lambda s: s["start"])
    parts = []
    last_end = 0
    for s in sorted_sigs:
        start, end = s["start"], s["end"]
        if start >= len(chars) or end > len(chars) or start >= end or start < last_end:
            continue
        if start > last_end:
            parts.append(html_mod.escape("".join(chars[last_end:start])))
        bg = _HTML_COLORS.get(s["label"], "#e9ecef")
        surface = html_mod.escape("".join(chars[start:end]))
        parts.append(
            f'<span class="ent" style="background:{bg}" '
            f'title="{html_mod.escape(s["label"])} ({s["confidence"]:.2f})">'
            f'{surface}<sub>{html_mod.escape(s["label"])}</sub></span>'
        )
        last_end = end
    if last_end < len(chars):
        parts.append(html_mod.escape("".join(chars[last_end:])))
    annotated = "".join(parts).replace("\n", "<br>\n")

    sig_rows = "\n".join(
        f"<tr><td>{s['id']}</td><td>[{s['start']},{s['end']})</td>"
        f"<td>{html_mod.escape(s['label'])}</td>"
        f"<td>{html_mod.escape(s['surface'])}</td>"
        f"<td>{s['confidence']:.2f}</td></tr>"
        for s in doc.signals
    )
    track_rows = "\n".join(
        f"<tr><td>{t['id']}</td><td>{html_mod.escape(t['canonical_surface'])}</td>"
        f"<td>{html_mod.escape(t['entity_type'])}</td>"
        f"<td>{', '.join(map(str, t['signal_ids']))}</td></tr>"
        for t in doc.tracks
    )
    ident_rows = "\n".join(
        f"<tr><td>{i['id']}</td><td>{html_mod.escape(i['canonical_name'])}</td>"
        f"<td>{html_mod.escape(i.get('kb_id') or '-')}</td></tr>"
        for i in doc.identities
    )
    stats = doc.stats()
    return f"""<!DOCTYPE html>
<html>
<head>
<meta charset="UTF-8">
<title>Document Debug: {html_mod.escape(doc.id)}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
.ent {{ padding: 1px 3px; border-radius: 3px; }}
.ent sub {{ font-size: 0.6em; color: #555; }}
table {{ border-collapse: collapse; margin: 1em 0; }}
td, th {{ border: 1px solid #ccc; padding: 3px 8px; font-size: 0.9em; }}
</style>
</head>
<body>
<h1>Document: {html_mod.escape(doc.id)}</h1>
<p>{stats['signal_count']} signals &middot; {stats['track_count']} tracks &middot;
{stats['identity_count']} identities &middot; avg confidence {stats['avg_confidence']:.2f}</p>
<h2>Annotated Text</h2>
<div class="text">{annotated}</div>
<h2>Signals</h2>
<table><tr><th>id</th><th>span</th><th>label</th><th>surface</th><th>conf</th></tr>
{sig_rows}
</table>
<h2>Tracks</h2>
<table><tr><th>id</th><th>canonical</th><th>type</th><th>signals</th></tr>
{track_rows}
</table>
<h2>Identities</h2>
<table><tr><th>id</th><th>canonical</th><th>kb</th></tr>
{ident_rows}
</table>
</body>
</html>
"""


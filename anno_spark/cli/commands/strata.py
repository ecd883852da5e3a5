"""`strata` — hierarchical clustering: reveal strata of abstraction.

Port of anno/src/cli/commands/strata.rs:47-216 + the HierarchicalLeiden
wrapper (strata/src/lib.rs:38-110): per level ℓ run Leiden at
resolution·2^ℓ and annotate each node with ``level_ℓ_community``.

The Leiden core is :func:`anno_spark.core.leiden_ref.leiden_ref` (the
sequential parity oracle of the distributed operators/communities.py) —
appropriate here because a GraphDocument handed to a CLI is driver-sized;
web-scale graphs go through `operators.communities` on DataFrames.
"""

from __future__ import annotations

import json
import sys

from ...core.leiden_ref import leiden_ref
from ..errors import CliError
from ..output import color, write_output


def run(args):
    if not args.input and not args.stdin:
        raise CliError("Either --input <FILE> or --stdin must be specified")
    if args.input and args.stdin:
        raise CliError("Cannot use both --input and --stdin. Choose one.")

    if args.stdin:
        content = sys.stdin.read()
    else:
        try:
            with open(args.input, encoding="utf-8") as f:
                content = f.read()
        except OSError as e:
            raise CliError(f"Failed to read input file {args.input}: {e}") from e

    try:
        graph = json.loads(content)
    except json.JSONDecodeError as e:
        raise CliError(f"Failed to parse GraphDocument JSON: {e}") from e

    nodes, edges = _parse_graph(graph)
    if args.verbose:
        print(f"Loaded graph with {len(nodes)} nodes and {len(edges)} edges",
              file=sys.stderr)

    if args.method != "leiden":
        raise CliError(
            f"Unsupported clustering method: '{args.method}'. "
            "Currently only 'leiden' is supported."
        )
    if args.verbose:
        print(
            f"Clustering with method={args.method}, resolution={args.resolution}, "
            f"levels={args.levels}",
            file=sys.stderr,
        )

    # strata/src/lib.rs:80-105 — one Leiden pass per level, doubling γ
    node_ids = [n["id"] for n in nodes]
    edge_triples = [(e["source"], e["target"], e.get("confidence", 1.0) or 1.0)
                    for e in edges
                    if e["source"] in set(node_ids) and e["target"] in set(node_ids)]
    for level in range(args.levels):
        resolution = args.resolution * (2.0 ** level)
        assign = leiden_ref(node_ids, edge_triples, resolution=resolution)
        # canonical ids (min member node) → dense integers in stable order
        dense: dict = {}
        for nid in node_ids:
            c = assign[nid]
            if c not in dense:
                dense[c] = len(dense)
        for n in nodes:
            n.setdefault("properties", {})[f"level_{level}_community"] = dense[assign[n["id"]]]

    clustered = {"nodes": nodes, "edges": edges, "metadata": graph.get("metadata", {})}

    if args.format == "json":
        out = json.dumps(clustered, indent=2, ensure_ascii=False)
    elif args.format == "jsonl":
        out = json.dumps(clustered, ensure_ascii=False)
    elif args.format == "human":
        out = _format_human(clustered, args.levels)
    else:
        raise CliError(
            f"Format '{args.format}' not supported for strata command. "
            "Use: json, jsonl, or human."
        )

    write_output(out, args.output)
    if args.output and args.verbose:
        print(f"Output written to {args.output}", file=sys.stderr)


def _parse_graph(graph: dict) -> tuple[list, list]:
    """Accept the reference GraphDocument layout ({nodes, edges}) and this
    engine's networkx export ({nodes, links})."""
    if not isinstance(graph, dict) or "nodes" not in graph:
        raise CliError("Input JSON is not a GraphDocument (missing 'nodes')")
    nodes = [dict(n) for n in graph["nodes"]]
    raw_edges = graph.get("edges", graph.get("links", []))
    edges = [dict(e) for e in raw_edges]
    for n in nodes:
        if "id" not in n:
            raise CliError("GraphDocument node missing 'id'")
        n.setdefault("name", n["id"])
    for e in edges:
        if "source" not in e or "target" not in e:
            raise CliError("GraphDocument edge missing source/target")
    return nodes, edges


def _format_human(graph: dict, levels: int) -> str:
    """strata.rs:149-216."""
    lines = [color("1;36", "Hierarchical Clustering Results"),
             f"  Nodes: {len(graph['nodes'])}",
             f"  Edges: {len(graph['edges'])}",
             f"  Levels: {levels}", ""]
    for level in range(levels):
        key = f"level_{level}_community"
        communities: dict = {}
        for n in graph["nodes"]:
            cid = (n.get("properties") or {}).get(key)
            if cid is not None:
                communities.setdefault(cid, []).append(n["name"])
        lines.append(
            f"{color('1;33', '=')} Level {level} Communities: {len(communities)}"
        )
        for cid, names in sorted(communities.items())[:10]:
            lines.append(f"  Community {cid}: {len(names)} nodes")
            if len(names) <= 5:
                lines.extend(f"    - {name}" for name in names)
            else:
                lines.extend(f"    - {name}" for name in names[:3])
                lines.append(f"    ... and {len(names) - 3} more")
        if len(communities) > 10:
            lines.append(f"  ... and {len(communities) - 10} more communities")
        lines.append("")
    return "\n".join(lines) + "\n"

"""CLI argument parsing (reference anno/src/cli/parser.rs:1-273).

argparse recast of the clap definition: same subcommands, aliases, flag
names, and defaults as the reference binary.
"""

from __future__ import annotations

import argparse

from .commands import crossdoc as crossdoc_cmd
from .commands import evalcmd
from .commands import extract as extract_cmd
from .commands import info as info_cmd
from .commands import pipeline as pipeline_cmd
from .commands import validate as validate_cmd

FORMATS = ("human", "json", "jsonl", "tsv", "inline", "grounded", "html", "tree", "summary")
MODELS = ("pattern", "heuristic", "statistical", "minimal", "auto", "stacked",
          "gliner", "gliner2", "nuner", "w2ner")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="anno-spark",
        description="Information Extraction CLI - NER, Coreference, Relations, Entity Linking",
        epilog=(
            "examples:\n"
            "  python -m anno_spark extract \"Marie Curie won the Nobel Prize.\"\n"
            "  python -m anno_spark crossdoc ./docs --threshold 0.6\n"
            "  python -m anno_spark pipeline --coref --link-kb \"Barack Obama met "
            "Angela Merkel. He praised her.\"\n"
            "  python -m anno_spark eval -t \"...\" -g \"Marie Curie:PER:0:11\"\n"
            "  python -m anno_spark info"
        ),
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command")

    # ------------------------------------------------------------------ extract
    ext = sub.add_parser(
        "extract", aliases=["x"], help="Extract entities from text (Level 1: Signal)"
    )
    ext.add_argument("-t", "--text", help="Input text to process")
    ext.add_argument("-f", "--file", metavar="PATH", help="Read input from file")
    ext.add_argument("-m", "--model", default="stacked", choices=MODELS)
    ext.add_argument(
        "-l", "--label", dest="labels", action="append", default=[], metavar="TYPE",
        help="Filter to specific entity types (repeatable)",
    )
    ext.add_argument("--format", default="human", choices=FORMATS)
    ext.add_argument("--export", metavar="PATH", help="Export GroundedDocument JSON to file")
    ext.add_argument(
        "--export-format", default="full", metavar="FORMAT",
        help="Export format when using --export (full, signals, minimal)",
    )
    ext.add_argument(
        "--export-graph", metavar="FORMAT",
        help="Export to graph format (neo4j, networkx, jsonld)",
    )
    ext.add_argument("--url", metavar="URL", help="URL to fetch content from")
    ext.add_argument("--clean", action="store_true", help="Clean whitespace before extraction")
    ext.add_argument("--normalize", action="store_true", help="Normalize Unicode")
    ext.add_argument("--detect-lang", action="store_true", help="Detect and record language")
    ext.add_argument("--negation", action="store_true", help="Detect negated entities")
    ext.add_argument("--quantifiers", action="store_true", help="Detect quantified entities")
    ext.add_argument("-v", "--verbose", action="store_true")
    ext.add_argument("-q", "--quiet", action="store_true")
    ext.add_argument("positional", nargs="*", help="Text to extract (positional)")
    ext.set_defaults(func=extract_cmd.run)

    # ----------------------------------------------------------------- crossdoc
    cd = sub.add_parser(
        "crossdoc", aliases=["coalesce"],
        help="Cross-document entity coalescing: cluster entities across documents",
    )
    cd.add_argument("directory", nargs="?", metavar="DIR",
                    help="Directory containing text files to process")
    cd.add_argument("-m", "--model", default="stacked", choices=MODELS)
    cd.add_argument("-t", "--threshold", type=float, default=0.6,
                    help="Similarity threshold for clustering (0.0-1.0)")
    cd.add_argument("--require-type-match", action="store_true",
                    help="Require entity type match for clustering")
    cd.add_argument("-f", "--format", default="json",
                    choices=("json", "jsonl", "tree", "summary"))
    cd.add_argument("--import", dest="import_paths", action="append", default=[],
                    metavar="PATH", help="Import GroundedDocument JSON file(s)/globs")
    cd.add_argument("--stdin", action="store_true",
                    help="Read GroundedDocument JSONL from stdin")
    cd.add_argument("--extensions", default="txt,md",
                    help="File extensions to process (comma-separated)")
    cd.add_argument("-r", "--recursive", action="store_true",
                    help="Recursively search subdirectories")
    cd.add_argument("--min-cluster-size", type=int, default=1)
    cd.add_argument("--cross-doc-only", action="store_true",
                    help="Only clusters appearing in 2+ docs")
    cd.add_argument("--type", dest="entity_types", action="append", default=[],
                    metavar="TYPE", help="Filter by entity type (repeatable)")
    cd.add_argument("--max-clusters", type=int, default=0,
                    help="Maximum clusters to output (0 = unlimited)")
    cd.add_argument("-o", "--output", help="Output file path (default: stdout)")
    cd.add_argument("--spark", action="store_true",
                    help="Run extraction distributed via the Spark engine")
    cd.add_argument("-v", "--verbose", action="store_true")
    cd.set_defaults(func=crossdoc_cmd.run)

    # ----------------------------------------------------------------- pipeline
    pl = sub.add_parser(
        "pipeline", aliases=["p"], help="Full processing pipeline"
    )
    pl.add_argument("text", nargs="*", help="Input text(s) to process")
    pl.add_argument("-f", "--files", action="append", default=[], metavar="PATH")
    pl.add_argument("-d", "--dir", metavar="DIR", help="Process directory of text files")
    pl.add_argument("-m", "--model", default="stacked", choices=MODELS)
    pl.add_argument("--coref", action="store_true", help="Run coreference resolution")
    pl.add_argument("--link-kb", action="store_true", help="Link tracks to KB identities")
    pl.add_argument("--cross-doc", action="store_true", help="Run cross-document clustering")
    pl.add_argument("--threshold", type=float, default=0.6)
    pl.add_argument("--format", default="human", choices=FORMATS)
    pl.add_argument("-o", "--output", metavar="PATH", help="Export results to file")
    pl.add_argument("--progress", action="store_true", help="Show progress")
    pl.add_argument("--spark", action="store_true",
                    help="Run extraction distributed via the Spark engine")
    pl.add_argument("-q", "--quiet", action="store_true")
    pl.set_defaults(func=pipeline_cmd.run)

    # --------------------------------------------------------------------- eval
    ev = sub.add_parser(
        "eval", aliases=["e"], help="Evaluate predictions against gold annotations"
    )
    ev.add_argument("-t", "--text", help="Input text to process")
    ev.add_argument("-f", "--file", metavar="PATH")
    ev.add_argument("-m", "--model", default="stacked", choices=MODELS)
    ev.add_argument("-g", "--gold", dest="gold_specs", action="append", default=[],
                    metavar="SPEC", help='Gold annotation: "text:label:start:end"')
    ev.add_argument("--gold-file", metavar="PATH",
                    help="Load gold annotations from JSONL file")
    ev.add_argument("--json", action="store_true", help="JSON output")
    ev.add_argument("-v", "--verbose", action="store_true")
    ev.add_argument("-q", "--quiet", action="store_true")
    ev.add_argument("positional", nargs="*")
    ev.set_defaults(func=evalcmd.run)

    # ----------------------------------------------------------------- validate
    va = sub.add_parser(
        "validate", aliases=["v"], help="Validate JSONL annotation files"
    )
    va.add_argument("files", nargs="+", help="JSONL files to validate")
    va.set_defaults(func=validate_cmd.run)

    # --------------------------------------------------------------------- info
    inf = sub.add_parser("info", aliases=["i"], help="Show model and version info")
    inf.set_defaults(func=info_cmd.run_info)

    # ------------------------------------------------------------------- models
    mo = sub.add_parser("models", help="List and compare available models")
    mo_sub = mo.add_subparsers(dest="action", required=True)
    mo_list = mo_sub.add_parser("list", aliases=["ls"])
    mo_list.set_defaults(func=info_cmd.run_models, action="list")
    mo_info = mo_sub.add_parser("info", aliases=["i"])
    mo_info.add_argument("model", metavar="MODEL")
    mo_info.set_defaults(func=info_cmd.run_models, action="info")
    mo_cmp = mo_sub.add_parser("compare", aliases=["c"])
    mo_cmp.set_defaults(func=info_cmd.run_models, action="compare")

    return p

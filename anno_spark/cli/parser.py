"""CLI argument parsing (reference anno/src/cli/parser.rs:1-273).

argparse recast of the clap definition: same subcommands, aliases, flag
names, and defaults as the reference binary.
"""

from __future__ import annotations

import argparse

from .commands import analyze as analyze_cmd
from .commands import batch as batch_cmd
from .commands import benchmark as benchmark_cmd
from .commands import compare as compare_cmd
from .commands import crossdoc as crossdoc_cmd
from .commands import dataset as dataset_cmd
from .commands import debug as debug_cmd
from .commands import enhance as enhance_cmd
from .commands import evalcmd
from .commands import extract as extract_cmd
from .commands import info as info_cmd
from .commands import pipeline as pipeline_cmd
from .commands import query as query_cmd
from .commands import strata as strata_cmd
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

    # -------------------------------------------------------------------- debug
    dbg = sub.add_parser(
        "debug", aliases=["d"], help="Generate debug visualization (text or HTML)"
    )
    dbg.add_argument("-t", "--text", help="Input text to process")
    dbg.add_argument("-f", "--file", metavar="PATH")
    dbg.add_argument("positional", nargs="*", metavar="TEXT")
    dbg.add_argument("--url", metavar="URL")
    dbg.add_argument("--clean", action="store_true")
    dbg.add_argument("--normalize", action="store_true")
    dbg.add_argument("--detect-lang", action="store_true")
    dbg.add_argument("--export-graph", metavar="FORMAT")
    dbg.add_argument("-m", "--model", default="stacked", choices=MODELS)
    dbg.add_argument("--html", action="store_true", help="Output as HTML")
    dbg.add_argument("--export", metavar="PATH")
    dbg.add_argument("--export-format", default="full", metavar="FORMAT")
    dbg.add_argument("-o", "--output", metavar="PATH")
    dbg.add_argument("--coref", action="store_true",
                     help="Run coreference resolution to form tracks")
    dbg.add_argument("--link-kb", action="store_true",
                     help="Link tracks to KB identities")
    dbg.add_argument("-q", "--quiet", action="store_true")
    dbg.add_argument("--verbose", action="store_true")
    dbg.set_defaults(func=debug_cmd.run)

    # ------------------------------------------------------------------ analyze
    an = sub.add_parser(
        "analyze", aliases=["a"], help="Deep analysis with multiple models"
    )
    an.add_argument("-t", "--text")
    an.add_argument("-f", "--file", metavar="PATH")
    an.add_argument("positional", nargs="*")
    an.set_defaults(func=analyze_cmd.run)

    # ------------------------------------------------------------------ dataset
    ds = sub.add_parser("dataset", aliases=["ds"], help="Work with NER datasets")
    ds_sub = ds.add_subparsers(dest="action", required=True)
    ds_list = ds_sub.add_parser("list", aliases=["ls"])
    ds_list.set_defaults(func=dataset_cmd.run, action="list")
    ds_info = ds_sub.add_parser("info", aliases=["i"])
    ds_info.add_argument("-d", "--dataset", required=True)
    ds_info.set_defaults(func=dataset_cmd.run, action="info")
    ds_eval = ds_sub.add_parser("eval", aliases=["e"])
    ds_eval.add_argument("-d", "--dataset", default="synthetic")
    ds_eval.add_argument("-m", "--model", default="stacked", choices=MODELS)
    ds_eval.add_argument("-t", "--task", default="ner",
                         choices=("ner", "coref", "relation"))
    ds_eval.set_defaults(func=dataset_cmd.run, action="eval")

    # ---------------------------------------------------------------- benchmark
    bm = sub.add_parser(
        "benchmark", aliases=["bench"],
        help="Comprehensive evaluation across task-dataset-backend combinations",
    )
    bm.add_argument("--suite", default="backends",
                    choices=("backends", "advanced", "tasks"))
    bm.add_argument("--tasks", action="append", default=[], metavar="TASK")
    bm.add_argument("--datasets", action="append", default=[], metavar="DATASET")
    bm.add_argument("--backends", action="append", default=[], metavar="BACKEND")
    bm.add_argument("--data", action="append", default=[], metavar="KEY=PATH",
                    help="Gold corpus path per dataset key (loads via Spark)")
    bm.add_argument("--max-examples", type=int, default=None)
    bm.add_argument("--format", default="markdown", choices=("markdown", "json"))
    bm.add_argument("-o", "--output", metavar="PATH")
    bm.set_defaults(func=benchmark_cmd.run)

    # ------------------------------------------------------------------ enhance
    en = sub.add_parser(
        "enhance", help="Enhance an existing GroundedDocument (coref, KB link)"
    )
    en.add_argument("input", metavar="FILE",
                    help='GroundedDocument JSON file (or "-" for stdin)')
    en.add_argument("--coref", action="store_true")
    en.add_argument("--link-kb", action="store_true")
    en.add_argument("-e", "--export", metavar="PATH")
    en.add_argument("--export-format", default="full", metavar="FORMAT")
    en.add_argument("--format", default="human", choices=FORMATS)
    en.add_argument("-q", "--quiet", action="store_true")
    en.set_defaults(func=enhance_cmd.run)

    # -------------------------------------------------------------------- query
    qu = sub.add_parser("query", aliases=["q"], help="Query and filter entities/clusters")
    qu.add_argument("input", metavar="FILE",
                    help="GroundedDocument JSON or cross-doc clusters JSON (- for stdin)")
    qu.add_argument("-t", "--type", metavar="TYPE")
    qu.add_argument("-e", "--entity", metavar="TEXT")
    qu.add_argument("--min-confidence", type=float, metavar="FLOAT")
    qu.add_argument("--start-offset", type=int, metavar="OFFSET")
    qu.add_argument("--end-offset", type=int, metavar="OFFSET")
    qu.add_argument("--negated", action="store_true")
    qu.add_argument("--quantified", action="store_true")
    qu.add_argument("--untracked", action="store_true")
    qu.add_argument("--linked", action="store_true")
    qu.add_argument("--unlinked", action="store_true")
    qu.add_argument("--format", default="human", choices=FORMATS)
    qu.add_argument("-o", "--output", metavar="PATH")
    qu.set_defaults(func=query_cmd.run)

    # ------------------------------------------------------------------ compare
    cp = sub.add_parser("compare", help="Compare documents, models, or clusters")
    cp.add_argument("file1", metavar="FILE1")
    cp.add_argument("file2", nargs="?", metavar="FILE2")
    cp.add_argument("--models", action="store_true",
                    help="Compare models on same text (file1 is the text file)")
    cp.add_argument("--model-list", type=lambda s: s.split(","), default=[],
                    metavar="MODELS", help="Comma-separated model names")
    cp.add_argument("--format", default="diff", help="diff, table, or summary")
    cp.add_argument("-o", "--output", metavar="PATH")
    cp.set_defaults(func=compare_cmd.run)

    # ------------------------------------------------------------------- strata
    st = sub.add_parser(
        "strata", help="Hierarchical clustering: reveal strata of abstraction"
    )
    st.add_argument("-i", "--input", metavar="FILE",
                    help="GraphDocument JSON file")
    st.add_argument("--stdin", action="store_true")
    st.add_argument("-m", "--method", default="leiden")
    st.add_argument("-r", "--resolution", type=float, default=1.0)
    st.add_argument("-l", "--levels", type=int, default=3)
    st.add_argument("-f", "--format", default="json",
                    choices=("json", "jsonl", "human"))
    st.add_argument("-o", "--output", metavar="PATH")
    st.add_argument("-v", "--verbose", action="store_true")
    st.set_defaults(func=strata_cmd.run)

    # -------------------------------------------------------------------- batch
    ba = sub.add_parser(
        "batch", aliases=["b"], help="Batch process multiple documents efficiently"
    )
    ba.add_argument("-d", "--dir", metavar="DIR")
    ba.add_argument("--stdin", action="store_true",
                    help="Read JSONL {id, text} rows from stdin")
    ba.add_argument("-m", "--model", default="stacked", choices=MODELS)
    ba.add_argument("--coref", action="store_true")
    ba.add_argument("--link-kb", action="store_true")
    ba.add_argument("-p", "--parallel", type=int, default=1,
                    help="Workers >1 routes extraction through Spark")
    ba.add_argument("--progress", action="store_true")
    ba.add_argument("--cache", action="store_true")
    ba.add_argument("--spark", action="store_true")
    ba.add_argument("-o", "--output", metavar="DIR")
    ba.add_argument("--format", default="grounded", choices=FORMATS)
    ba.add_argument("-q", "--quiet", action="store_true")
    ba.set_defaults(func=batch_cmd.run)

    # -------------------------------------------------------------------- cache
    from .commands import cacheconf

    ca = sub.add_parser("cache", help="Manage cache for extraction results")
    ca.add_argument("--cache-dir", metavar="DIR", help="Override cache directory")
    ca_sub = ca.add_subparsers(dest="action", required=True)
    ca_sub.add_parser("list", aliases=["ls"]).set_defaults(
        func=cacheconf.run_cache, action="list")
    ca_sub.add_parser("clear").set_defaults(func=cacheconf.run_cache, action="clear")
    ca_sub.add_parser("stats").set_defaults(func=cacheconf.run_cache, action="stats")
    ca_inv = ca_sub.add_parser("invalidate")
    ca_inv.add_argument("--model", metavar="MODEL")
    ca_inv.add_argument("--file", metavar="FILE")
    ca_inv.set_defaults(func=cacheconf.run_cache, action="invalidate")

    # ------------------------------------------------------------------- config
    co = sub.add_parser("config", help="Manage configuration files for workflows")
    co.add_argument("--config-dir", metavar="DIR", help="Override config directory")
    co_sub = co.add_subparsers(dest="action", required=True)
    co_save = co_sub.add_parser("save")
    co_save.add_argument("name", metavar="NAME")
    co_save.add_argument("--model", metavar="MODEL")
    co_save.add_argument("--coref", action="store_true")
    co_save.add_argument("--link-kb", action="store_true")
    co_save.add_argument("--threshold", type=float, metavar="FLOAT")
    co_save.set_defaults(func=cacheconf.run_config, action="save")
    co_sub.add_parser("list", aliases=["ls"]).set_defaults(
        func=cacheconf.run_config, action="list")
    co_show = co_sub.add_parser("show")
    co_show.add_argument("name", metavar="NAME")
    co_show.set_defaults(func=cacheconf.run_config, action="show")
    co_del = co_sub.add_parser("delete")
    co_del.add_argument("name", metavar="NAME")
    co_del.set_defaults(func=cacheconf.run_config, action="delete")

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

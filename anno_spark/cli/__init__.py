"""User-facing CLI (SURVEY §2.11; reference anno-cli/src/main.rs:1-2916).

``python -m anno_spark <command>`` mirrors the reference ``anno`` binary:

* ``extract`` (alias ``x``) — single-document NER → main.rs:226, extract.rs
* ``crossdoc`` (alias ``coalesce``) — cross-document entity coalescing over
  a directory / imported GroundedDocument JSON → main.rs:237, crossdoc.rs
* ``pipeline`` (alias ``p``) — extract + coref + KB link (+ cross-doc) over
  texts/files/dirs → main.rs:241, pipeline.rs
* ``eval`` (alias ``e``) — P/R/F1 vs gold specs → eval.rs
* ``validate`` (alias ``v``) — JSONL annotation lint → validate.rs
* ``info`` (alias ``i``) / ``models`` — capability listing → info.rs, models.rs

Single-document commands run the same pure-Python core the Spark Arrow UDFs
execute (anno_spark.core.*), so CLI output is byte-identical to what the
distributed pipeline extracts for the same text.  Directory-scale commands
accept ``--spark`` to route extraction + clustering through the distributed
operators instead of the in-process path.
"""

from __future__ import annotations

import sys

from .errors import CliError

__all__ = ["CliError", "main"]


def main(argv=None) -> int:
    """main.rs:217-287 — parse, dispatch, map errors to exit code 1."""
    from .parser import build_parser

    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()

    # main.rs:251-277 — bare positional text means `extract`
    known = {
        "extract", "x", "crossdoc", "coalesce", "pipeline", "p",
        "eval", "e", "validate", "v", "info", "i", "models",
        "debug", "d", "analyze", "a", "dataset", "ds",
        "benchmark", "bench", "enhance", "query", "q", "compare",
        "strata", "batch", "b", "cache", "config",
        "-h", "--help", "--version",
    }
    if argv and argv[0] not in known:
        argv = ["extract", "--"] + argv if argv[0].startswith("-") else ["extract"] + argv
    if not argv:
        print("No input provided. Run `python -m anno_spark --help` for usage.", file=sys.stderr)
        return 1

    args = parser.parse_args(argv)
    try:
        args.func(args)
        return 0
    except CliError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

"""CLI utilities (reference anno/src/cli/utils.rs:1-795).

Input resolution, gold-spec parsing, and the driver-side coref/KB-link
helpers the ``pipeline`` command applies.  Negation and quantifier
detection reuse :mod:`anno_spark.core.annotations` (the same functions the
Spark extraction UDF runs); coref reuses :mod:`anno_spark.core.coref`.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass

from .errors import CliError
from .output import color


def get_input_text(text, file, positional) -> str:
    """utils.rs:11-43 — precedence: -t text > -f file > positional > stdin."""
    if text is not None:
        return text
    if file is not None:
        return read_input_file(file)
    if positional:
        return " ".join(positional)
    if not sys.stdin.isatty():
        buf = sys.stdin.read()
        if buf:
            return buf
    raise CliError("No input text provided. Use -t 'text' or -f file or pipe via stdin")


def read_input_file(path: str) -> str:
    """utils.rs:46-48."""
    try:
        with open(path, encoding="utf-8") as f:
            return f.read()
    except OSError as e:
        raise CliError(f"Failed to read file: {path}: {e}") from e


@dataclass
class GoldSpec:
    """utils.rs:76-83 — one gold annotation."""

    text: str
    label: str
    start: int
    end: int


def parse_gold_spec(s: str) -> GoldSpec | None:
    """utils.rs:84-104 — "text:label:start:end", rsplit so the text may
    itself contain colons (URLs)."""
    parts = s.rsplit(":", 3)
    if len(parts) < 4:
        return None
    text, label, start_s, end_s = parts
    try:
        start, end = int(start_s), int(end_s)
    except ValueError:
        return None
    return GoldSpec(text, label, start, end)


def load_gold_from_file(path: str) -> list:
    """utils.rs:106-169 — JSONL with {"entities": [{text,type|label,start,end}]}."""
    try:
        with open(path, encoding="utf-8") as f:
            content = f.read()
    except OSError as e:
        raise CliError(f"Failed to read {path}: {e}") from e

    gold: list[GoldSpec] = []
    warnings: list[str] = []
    for line_num, line in enumerate(content.splitlines(), start=1):
        if not line.strip():
            continue
        try:
            entry = json.loads(line)
        except json.JSONDecodeError as e:
            raise CliError(f"Invalid JSON in gold file at line {line_num}: {e}") from e
        for i, ent in enumerate(entry.get("entities") or []):
            start = ent.get("start")
            if not isinstance(start, int):
                warnings.append(
                    f"{path}:{line_num}: entity[{i}] missing 'start' field, defaulting to 0"
                )
                start = 0
            end = ent.get("end")
            if not isinstance(end, int):
                warnings.append(
                    f"{path}:{line_num}: entity[{i}] missing 'end' field, defaulting to 0"
                )
                end = 0
            gold.append(
                GoldSpec(
                    text=ent.get("text") or "",
                    label=ent.get("type") or ent.get("label") or "UNK",
                    start=start,
                    end=end,
                )
            )
    for w in warnings:
        print(f"{color('33', 'warning:')} {w}", file=sys.stderr)
    return gold


def types_match_flexible(pred: str, gold: str) -> bool:
    """utils.rs:224-246 — PER/PERSON, LOC/GPE, ORG aliases, DATE/YEAR."""
    pred, gold = pred.upper(), gold.upper()
    if pred == gold:
        return True
    pairs = {
        ("PERSON", "PER"), ("PER", "PERSON"),
        ("LOCATION", "LOC"), ("LOC", "LOCATION"),
        ("LOCATION", "GPE"), ("GPE", "LOCATION"),
        ("ORGANIZATION", "ORG"), ("ORG", "ORGANIZATION"),
        ("DATE", "YEAR"), ("YEAR", "DATE"), ("DATE", "HOURS"),
    }
    return (pred, gold) in pairs


def find_similar_models(query: str, candidates) -> list[str]:
    """utils.rs:628-660 — prefix > substring > first-char, top 3."""
    q = query.lower()
    scored = []
    for c in candidates:
        cl = c.lower()
        if cl.startswith(q) or q.startswith(cl):
            scored.append((0.9, c))
        elif q in cl or cl in q:
            scored.append((0.7, c))
        elif cl[:1] == q[:1]:
            scored.append((0.5, c))
    scored.sort(key=lambda t: -t[0])
    return [name for _, name in scored[:3]]


def collect_text_files(directory: str, extensions, recursive: bool) -> list[str]:
    """crossdoc.rs:104-129 — files under `directory` with given extensions."""
    import os

    files: list[str] = []
    try:
        entries = sorted(os.listdir(directory))
    except OSError as e:
        raise CliError(f"Failed to read directory {directory}: {e}") from e
    for name in entries:
        path = os.path.join(directory, name)
        if os.path.isdir(path) and recursive:
            files.extend(collect_text_files(path, extensions, recursive))
        elif os.path.isfile(path):
            ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            if ext in extensions:
                files.append(path)
    return files

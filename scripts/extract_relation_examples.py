"""One-off transcriber: reference synthetic relation examples -> Python.

Reads the relation-extraction gold corpus (reference:
anno/src/eval/dataset/synthetic/relations.rs:80-556) and emits
``anno_spark/eval/relation_data.py``.  Data transcription, reproducible.

Usage: python scripts/extract_relation_examples.py
"""

from __future__ import annotations

import re
from pathlib import Path

SRC = Path("/root/reference/anno/src/eval/dataset/synthetic/relations.rs")
OUT = Path(__file__).resolve().parent.parent / "anno_spark/eval/relation_data.py"

_WS = r"(?:\s|//[^\n]*)*"  # whitespace or // comments between tokens
_EXAMPLE_RE = re.compile(
    rf"RelationExample\s*\{{{_WS}text:\s*(\"(?:[^\"\\]|\\.)*\")\s*\.to_string\(\)\s*,"
    r"\s*relations:\s*vec!\[(.*?)\]\s*,"
    r"\s*difficulty:\s*Difficulty::(\w+)\s*,"
    r"\s*domain:\s*Domain::(\w+)\s*,?\s*\}",
    re.S,
)
_GOLD_RE = re.compile(
    r"RelationGold::new\(\s*\((\d+),\s*(\d+)\)\s*,\s*(\"(?:[^\"\\]|\\.)*\")"
    r"\s*,\s*(\"(?:[^\"\\]|\\.)*\")\s*,\s*\((\d+),\s*(\d+)\)\s*,"
    r"\s*(\"(?:[^\"\\]|\\.)*\")\s*,\s*(\"(?:[^\"\\]|\\.)*\")\s*,"
    r"\s*(\"(?:[^\"\\]|\\.)*\")\s*,?\s*\)",
    re.S,
)

_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "'": "'"}


def _rust_str(s: str) -> str:
    body = s[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(body[i])
            i += 1
    return "".join(out)


def extract() -> list:
    source = SRC.read_text()
    examples = []
    for em in _EXAMPLE_RE.finditer(source):
        text = _rust_str(em.group(1))
        rels = []
        for g in _GOLD_RE.finditer(em.group(2)):
            rels.append((
                (int(g.group(1)), int(g.group(2))), _rust_str(g.group(3)),
                _rust_str(g.group(4)),
                (int(g.group(5)), int(g.group(6))), _rust_str(g.group(7)),
                _rust_str(g.group(8)), _rust_str(g.group(9)),
            ))
        n_raw = em.group(2).count("RelationGold::new")
        assert n_raw == len(rels), text[:40]
        examples.append((text, rels, em.group(3), em.group(4)))
    return examples


def render(examples: list) -> str:
    lines = [
        '"""Synthetic relation-extraction gold corpus, transcribed from the',
        "reference (anno/src/eval/dataset/synthetic/relations.rs via",
        "scripts/extract_relation_examples.py — data, not code).",
        "",
        "Each example: (text, relations, difficulty, domain); each relation:",
        "((head_start, head_end), head_type, head_text,",
        " (tail_start, tail_end), tail_type, tail_text, relation_type).",
        '"""',
        "",
        "EXAMPLES = [",
    ]
    for (text, rels, difficulty, domain) in examples:
        lines.append(f"    ({text!r},")
        lines.append(f"     {rels!r},")
        lines.append(f"     {difficulty!r}, {domain!r}),")
    lines.append("]")
    lines.append("")
    return "\n".join(lines)


def main():
    examples = extract()
    n_rel = sum(len(e[1]) for e in examples)
    print(f"{len(examples)} examples, {n_rel} relations")
    OUT.write_text(render(examples))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

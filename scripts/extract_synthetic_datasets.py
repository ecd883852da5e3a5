"""One-off transcriber: reference synthetic NER datasets -> Python data.

Reads the reference's hand-authored synthetic corpus (reference:
anno/src/eval/dataset/synthetic/*.rs) and emits
``anno_spark/eval/synthetic_data.py`` as plain literals.  The examples
are DATA (the spec's gold annotations), not code; this script exists so
the transcription is reproducible and auditable rather than hand-typed.

Usage: python scripts/extract_synthetic_datasets.py [--check]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

SRC = Path("/root/reference/anno/src/eval/dataset/synthetic")
OUT = Path(__file__).resolve().parent.parent / "anno_spark/eval/synthetic_data.py"

_TYPE_MAP = {
    "Person": "PER",
    "Organization": "ORG",
    "Location": "LOC",
    "Date": "DATE",
    "Time": "TIME",
    "Money": "MONEY",
    "Percent": "PERCENT",
    "Quantity": "QUANTITY",
    "Cardinal": "CARDINAL",
    "Ordinal": "ORDINAL",
}

_FN_RE = re.compile(
    r"pub fn (\w+)\(\)\s*->\s*Vec<AnnotatedExample>\s*\{", re.S)
_EXAMPLE_RE = re.compile(
    r"AnnotatedExample\s*\{\s*text:\s*(\"(?:[^\"\\]|\\.)*\")\s*(?:\.into\(\)|\.to_string\(\))?\s*,"
    r"\s*entities:\s*vec!\[(.*?)\]\s*,"
    r"\s*domain:\s*Domain::(\w+)\s*,"
    r"\s*difficulty:\s*Difficulty::(\w+)\s*,?\s*\}",
    re.S,
)
_ENTITY_RE = re.compile(
    r"entity\(\s*(\"(?:[^\"\\]|\\.)*\")\s*,\s*EntityType::(\w+)\s*,\s*(\d+)\s*,?\s*\)")


_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r", "'": "'"}


def _rust_str(s: str) -> str:
    # rust string literal -> python str; unescape by hand so UTF-8 text
    # survives (codecs' unicode_escape is latin-1-based and mangles it)
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        if body[i] == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(body[i])
            i += 1
    return "".join(out)


def _body_of(source: str, start: int) -> str:
    depth = 0
    for i in range(start, len(source)):
        if source[i] == "{":
            depth += 1
        elif source[i] == "}":
            depth -= 1
            if depth == 0:
                return source[start:i + 1]
    raise ValueError("unbalanced braces")


def extract() -> dict:
    datasets: dict = {}
    for path in sorted(SRC.glob("*.rs")):
        if path.name in ("mod.rs", "relations.rs", "discontinuous.rs"):
            continue  # different structs; handled by their own modules
        source = path.read_text()
        for m in _FN_RE.finditer(source):
            fn_name = m.group(1)
            body = _body_of(source, m.end() - 1)
            examples = []
            for em in _EXAMPLE_RE.finditer(body):
                text = _rust_str(em.group(1))
                ents = []
                for ee in _ENTITY_RE.finditer(em.group(2)):
                    etext = _rust_str(ee.group(1))
                    etype = _TYPE_MAP.get(ee.group(2), ee.group(2).upper())
                    start = int(ee.group(3))
                    ents.append((etext, etype, start))
                # entity arm count sanity: every entity( in the vec parsed
                n_raw = em.group(2).count("entity(")
                assert n_raw == len(ents), (path.name, fn_name, text[:40])
                examples.append(
                    (text, ents, em.group(3), em.group(4)))
            if examples:
                if fn_name == "dataset":
                    key = path.stem  # per-domain file's bare dataset()
                elif fn_name.endswith("_dataset"):
                    key = fn_name[:-len("_dataset")]
                else:
                    key = fn_name
                datasets.setdefault(key, []).extend(examples)
    return datasets


def render(datasets: dict) -> str:
    lines = [
        '"""Synthetic NER gold corpus, transcribed from the reference',
        "(anno/src/eval/dataset/synthetic/*.rs via",
        "scripts/extract_synthetic_datasets.py — data, not code).",
        "",
        "Each example: (text, [(entity_text, entity_type, start), ...],",
        "domain, difficulty).  Offsets are transcribed verbatim; any",
        "reference offset quirks are pinned by tests, not corrected.",
        '"""',
        "",
        "DATASETS = {",
    ]
    for key in sorted(datasets):
        lines.append(f"    {key!r}: [")
        for (text, ents, domain, difficulty) in datasets[key]:
            lines.append(f"        ({text!r},")
            lines.append(f"         {ents!r},")
            lines.append(f"         {domain!r}, {difficulty!r}),")
        lines.append("    ],")
    lines.append("}")
    lines.append("")
    return "\n".join(lines)


def main():
    datasets = extract()
    n = sum(len(v) for v in datasets.values())
    print(f"{len(datasets)} datasets, {n} examples")
    out = render(datasets)
    if "--check" in sys.argv:
        current = OUT.read_text()
        sys.exit(0 if current == out else 1)
    OUT.write_text(out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

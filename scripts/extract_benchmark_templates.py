"""One-off transcriber: reference edge-case benchmark templates -> Python.

Reads the ten edge-case template families in the reference benchmark
module (reference: anno/src/eval/benchmark.rs:106-760) and emits
``anno_spark/eval/benchmark_data.py``.  Like the synthetic-corpus
extraction, this is DATA transcription kept reproducible.

Usage: python scripts/extract_benchmark_templates.py
"""

from __future__ import annotations

import re
from pathlib import Path

SRC = Path("/root/reference/anno/src/eval/benchmark.rs")
OUT = Path(__file__).resolve().parent.parent / "anno_spark/eval/benchmark_data.py"

_TYPE_MAP = {
    "Person": "PER", "Organization": "ORG", "Location": "LOC",
    "Date": "DATE", "Time": "TIME", "Money": "MONEY",
    "Percent": "PERCENT", "Quantity": "QUANTITY",
}

_FN_RE = re.compile(
    r"fn generate_(\w+)_examples\(count: usize\) -> Vec<AnnotatedExample> \{"
    r"(.*?)generate_from_templates\(&templates, count, Domain::(\w+), "
    r"Difficulty::(\w+)\)",
    re.S,
)
_TEMPLATE_RE = re.compile(
    r"\(\s*(\"(?:[^\"\\]|\\.)*\")\s*,\s*vec!\[(.*?)\]\s*,?\s*\)", re.S)
_ENTITY_RE = re.compile(
    r"\(\s*(\"(?:[^\"\\]|\\.)*\")\s*,\s*EntityType::(\w+)\s*,\s*(\d+)\s*,?\s*\)")
# EntityType::Other("Label".to_string()) — custom label kept verbatim
# (engine convention: Other(s) keeps its string, core/entity.py)
_ENTITY_OTHER_RE = re.compile(
    r"\(\s*(\"(?:[^\"\\]|\\.)*\")\s*,\s*EntityType::Other\(\s*"
    r"(\"(?:[^\"\\]|\\.)*\")\s*\.to_string\(\)\s*\)\s*,\s*(\d+)\s*,?\s*\)")

_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r", "'": "'"}


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


def extract() -> dict:
    source = SRC.read_text()
    families = {}
    for m in _FN_RE.finditer(source):
        family, body, domain, difficulty = m.groups()
        templates = []
        for tm in _TEMPLATE_RE.finditer(body):
            text = _rust_str(tm.group(1))
            ents = [(e.start(), _rust_str(e.group(1)),
                     _TYPE_MAP.get(e.group(2), e.group(2).upper()),
                     int(e.group(3)))
                    for e in _ENTITY_RE.finditer(tm.group(2))
                    if e.group(2) != "Other"]
            ents += [(e.start(), _rust_str(e.group(1)),
                      _rust_str(e.group(2)), int(e.group(3)))
                     for e in _ENTITY_OTHER_RE.finditer(tm.group(2))]
            ents = [t[1:] for t in sorted(ents)]  # source order
            n_raw = len(re.findall(r"EntityType::", tm.group(2)))
            assert n_raw == len(ents), (family, text[:40])
            templates.append((text, ents))
        assert templates, family
        families[family] = (templates, domain, difficulty)
    return families


def render(families: dict) -> str:
    lines = [
        '"""Edge-case benchmark templates, transcribed from the reference',
        "(anno/src/eval/benchmark.rs:106-760 via",
        "scripts/extract_benchmark_templates.py — data, not code).",
        "",
        "TEMPLATES[family] = (templates, domain, difficulty); each",
        "template is (text, [(entity_text, entity_type, start), ...]).",
        '"""',
        "",
        "TEMPLATES = {",
    ]
    for fam in sorted(families):
        templates, domain, difficulty = families[fam]
        lines.append(f"    {fam!r}: ([")
        for (text, ents) in templates:
            lines.append(f"        ({text!r},")
            lines.append(f"         {ents!r}),")
        lines.append(f"    ], {domain!r}, {difficulty!r}),")
    lines.append("}")
    lines.append("")
    return "\n".join(lines)


def main():
    families = extract()
    n = sum(len(t) for (t, _, _) in families.values())
    print(f"{len(families)} families, {n} templates")
    OUT.write_text(render(families))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

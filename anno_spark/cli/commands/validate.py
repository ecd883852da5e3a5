"""`validate` — lint JSONL annotation files.

Port of anno/src/cli/commands/validate.rs:16-143: per-entity span checks
(out-of-bounds / inverted span = error, surface mismatch = warning),
missing start/end = warning-with-default, summary line, exit 1 when any
error.  Offsets are character offsets.
"""

from __future__ import annotations

import json
import sys

from ..errors import CliError
from ..output import color


def run(args):
    total_errors = 0
    total_warnings = 0
    total_entries = 0

    for path in args.files:
        try:
            with open(path, encoding="utf-8") as f:
                content = f.read()
        except OSError as e:
            raise CliError(f"Failed to read {path}: {e}") from e

        for line_num, line in enumerate(content.splitlines(), start=1):
            if not line.strip():
                continue
            total_entries += 1
            try:
                entry = json.loads(line)
            except json.JSONDecodeError as e:
                raise CliError(f"{path}:{line_num}: Invalid JSON: {e}") from e

            text = entry.get("text")
            if not isinstance(text, str):
                raise CliError(f"{path}:{line_num}: Missing 'text' field")
            entities = entry.get("entities")
            if not isinstance(entities, list):
                raise CliError(f"{path}:{line_num}: Missing 'entities' array")

            for i, ent in enumerate(entities):
                start = ent.get("start")
                if not isinstance(start, int):
                    print(
                        f"{color('33', 'warn')} {path}:{line_num}:entity[{i}]: "
                        f"missing 'start' field",
                        file=sys.stderr,
                    )
                    total_warnings += 1
                    start = 0
                end = ent.get("end")
                if not isinstance(end, int):
                    print(
                        f"{color('33', 'warn')} {path}:{line_num}:entity[{i}]: "
                        f"missing 'end' field",
                        file=sys.stderr,
                    )
                    total_warnings += 1
                    end = 0
                ent_text = ent.get("text") or ""

                # Signal::validate_against (grounded.rs): bounds/ordering
                # errors are hard; surface mismatch is a warning.
                if start > end or start < 0:
                    print(
                        f"{color('31', 'error')} {path}:{line_num}:entity[{i}]: "
                        f"invalid span [{start},{end})",
                        file=sys.stderr,
                    )
                    total_errors += 1
                elif end > len(text):
                    print(
                        f"{color('31', 'error')} {path}:{line_num}:entity[{i}]: "
                        f"span [{start},{end}) out of bounds for text length {len(text)}",
                        file=sys.stderr,
                    )
                    total_errors += 1
                elif ent_text and text[start:end] != ent_text:
                    print(
                        f"{color('33', 'warn')} {path}:{line_num}:entity[{i}]: "
                        f"surface {ent_text!r} != text[{start}:{end}] {text[start:end]!r}",
                        file=sys.stderr,
                    )
                    total_warnings += 1

    print()
    print(f"Validated {total_entries} entries in {len(args.files)} file(s)")
    if total_errors > 0:
        print(f"{color('31', 'x')} {total_errors} errors")
    if total_warnings > 0:
        print(f"{color('33', '!')} {total_warnings} warnings")
    if total_errors == 0 and total_warnings == 0:
        print(f"{color('32', 'ok:')} All valid")

    if total_errors > 0:
        raise CliError(f"{total_errors} validation errors")

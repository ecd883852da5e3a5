"""Output formatting (reference anno/src/cli/output.rs:1-248).

ANSI color only when stdout is a terminal (output.rs:52-58); honors
``NO_COLOR`` as modern CLIs do.  Offsets are Unicode character offsets
throughout, matching the core data model (entity.rs:1638-1647).
"""

from __future__ import annotations

import os
import sys


def color(code: str, text: str) -> str:
    """output.rs:52-58 — wrap in ANSI codes iff stdout is a tty."""
    if sys.stdout.isatty() and not os.environ.get("NO_COLOR"):
        return f"\x1b[{code}m{text}\x1b[0m"
    return text


def type_color(typ: str) -> str:
    """output.rs:61-71 — color code per entity type."""
    t = typ.lower()
    if t in ("person", "per"):
        return "1;34"
    if t in ("organization", "org"):
        return "1;32"
    if t in ("location", "loc", "gpe"):
        return "1;33"
    if t in ("date", "time"):
        return "1;35"
    if t in ("money", "percent"):
        return "1;36"
    if t in ("email", "url", "phone"):
        return "36"
    return "1;37"


def metric_colored(value: float) -> str:
    """output.rs:74-85 — threshold-colored percentage."""
    if value >= 90.0:
        code = "1;32"
    elif value >= 70.0:
        code = "1;33"
    elif value >= 50.0:
        code = "33"
    else:
        code = "1;31"
    return color(code, f"{value:5.1f}")


def confidence_bar(conf: float) -> str:
    """output.rs:88-104 — ten-cell confidence meter."""
    filled = min(int(round(conf * 10.0)), 10)
    code = "32" if conf >= 0.9 else ("33" if conf >= 0.7 else "31")
    return color(code, "#" * filled) + color("90", "." * (10 - filled))


def format_size(n_bytes: int) -> str:
    """output.rs:34-49 — human-readable byte size."""
    units = ["B", "KB", "MB", "GB", "TB"]
    size, idx = float(n_bytes), 0
    while size >= 1024.0 and idx < len(units) - 1:
        size /= 1024.0
        idx += 1
    return f"{n_bytes} {units[0]}" if idx == 0 else f"{size:.2f} {units[idx]}"


def log_info(msg: str, quiet: bool):
    if not quiet:
        print(msg, file=sys.stderr)


def write_output(content: str, path: str | None):
    """output.rs:21-31 — to file when given, else stdout."""
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(content)
    else:
        sys.stdout.write(content)
        sys.stdout.flush()


def print_signals(signals, text: str, verbose: bool):
    """output.rs:107-160 — grouped-by-type listing with confidence bars.

    ``signals`` is a list of signal dicts (see cli.grounded.Signal shape).
    """
    by_type: dict[str, list] = {}
    for s in signals:
        by_type.setdefault(s["label"], []).append(s)

    for typ, sigs in by_type.items():
        print(f"  {color(type_color(typ), typ)} ({len(sigs)}):")
        for s in sigs:
            start, end = s["start"], s["end"]
            neg = color("31", " [NEG]") if s.get("negated") else ""
            quant = (
                color("35", f" [{s['quantifier']}]") if s.get("quantifier") else ""
            )
            print(
                f"    [{start:3},{end:3}) {confidence_bar(s['confidence'])} "
                f"\"{s['surface']}\"{neg}{quant}"
            )
            if verbose:
                chars = list(text)
                ctx_start = max(start - 15, 0)
                ctx_end = min(end + 15, len(chars))
                before = "".join(chars[ctx_start:start])
                entity = "".join(chars[start:end])
                after = "".join(chars[end:ctx_end])
                print(
                    "           "
                    + color("90", "...")
                    + color("90", before)
                    + color("1;33", entity)
                    + color("90", after)
                    + color("90", "...")
                )


def print_annotated_signals(text: str, signals):
    """output.rs:206-248 — inline [TYPE: surface] annotations."""
    sorted_sigs = sorted(signals, key=lambda s: s["start"])
    chars = list(text)
    char_len = len(chars)
    out = []
    last_end = 0
    for s in sorted_sigs:
        start, end = s["start"], s["end"]
        if start >= char_len or end > char_len or start >= end or start < last_end:
            continue
        if start > last_end:
            out.append("".join(chars[last_end:start]))
        surface = "".join(chars[start:end])
        out.append(color(type_color(s["label"]), f"[{s['label']}: {surface}]"))
        last_end = end
    if last_end < char_len:
        out.append("".join(chars[last_end:]))
    print()
    for line in "".join(out).splitlines():
        print(f"  {line}")

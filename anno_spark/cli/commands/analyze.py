"""`analyze` — multi-model deep analysis with agreement breakdown.

Port of anno/src/cli/commands/analyze.rs:27-142.
"""

from __future__ import annotations

import time

from ..backends import BACKENDS
from ..output import color, print_annotated_signals
from ..utils import get_input_text


def run(args):
    text = get_input_text(args.text, args.file, args.positional)

    bar = "=" * 71
    print()
    print(color("1;36", bar))
    print(f"  {color('1;36', 'DEEP ANALYSIS')}")
    print(color("1;36", bar))
    print()

    all_results: dict[str, list] = {}
    for name in ("pattern", "heuristic", "stacked"):
        extract = BACKENDS[name]
        start = time.perf_counter()
        mentions = extract(text)
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        print(f"{color('1;33', name)}:")
        print(f"  {len(mentions)} entities in {elapsed_ms:.1f}ms")
        if mentions:
            by_type: dict[str, int] = {}
            for m in mentions:
                by_type[m.entity_type] = by_type.get(m.entity_type, 0) + 1
            for t, c in by_type.items():
                print(f"    {t}: {c}")
        print()
        all_results[name] = mentions

    # analyze.rs:85-134 — agreement between stacked and its layers
    print(f"{color('1;33', 'Model Agreement')}:")
    stacked = all_results["stacked"]
    pattern = all_results["pattern"]
    heuristic = all_results["heuristic"]

    def spans(ms):
        return {(m.start, m.end) for m in ms}

    pat_spans, heu_spans, stk_spans = spans(pattern), spans(heuristic), spans(stacked)
    agreed = [m for m in stacked if (m.start, m.end) in pat_spans | heu_spans]
    only_stacked = [m for m in stacked if (m.start, m.end) not in pat_spans | heu_spans]
    pattern_only = sum(1 for m in pattern if (m.start, m.end) not in stk_spans)
    heuristic_only = sum(1 for m in heuristic if (m.start, m.end) not in stk_spans)

    print(f"  Agreed (in stacked from pattern/heuristic): {len(agreed)} entities")
    print(f"  Pattern-only (not in stacked): {pattern_only} entities")
    print(f"  Heuristic-only (not in stacked): {heuristic_only} entities")
    print(f"  Stacked-only (novel combinations): {len(only_stacked)} entities")
    print()

    print(f"{color('1;33', 'Annotated Text')}:")
    print_annotated_signals(
        text,
        [{"start": m.start, "end": m.end, "label": m.entity_type} for m in stacked],
    )
    print()

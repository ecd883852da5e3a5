"""`eval` — P/R/F1 against inline or file gold annotations.

Port of anno/src/cli/commands/eval.rs:63-275 (HTML report omitted — the
reference gates it behind render_eval_html; json + human are the tested
surfaces).
"""

from __future__ import annotations

import json
import time

from ...eval.comparison import EvalComparison, Sig
from ..backends import create_model
from ..errors import CliError
from ..output import color, metric_colored
from ..utils import get_input_text, load_gold_from_file, parse_gold_spec


def run(args):
    text = get_input_text(args.text, args.file, args.positional)

    if args.gold_file:
        gold_specs = load_gold_from_file(args.gold_file)
    elif args.gold_specs:
        gold_specs = [g for g in (parse_gold_spec(s) for s in args.gold_specs) if g]
    else:
        raise CliError(
            "No gold annotations. Use -g 'text:label:start:end' or --gold-file path.jsonl"
        )
    if not gold_specs:
        raise CliError("No valid gold annotations found")

    model = create_model(args.model)
    start_t = time.perf_counter()
    mentions = model(text)
    elapsed_ms = (time.perf_counter() - start_t) * 1000.0

    gold = [Sig(i, g.start, g.end, g.text, g.label) for i, g in enumerate(gold_specs)]
    pred = [
        Sig(i, m.start, m.end, m.text, m.entity_type, m.confidence)
        for i, m in enumerate(mentions)
    ]
    cmp = EvalComparison.compare(text, gold, pred)

    if args.json:
        out = {
            "model": args.model,
            "elapsed_ms": elapsed_ms,
            "gold_count": len(cmp.gold),
            "predicted_count": len(cmp.predicted),
            "correct": cmp.correct_count(),
            "errors": cmp.error_count(),
            "precision": cmp.precision(),
            "recall": cmp.recall(),
            "f1": cmp.f1(),
            "matches": cmp.matches,
        }
        print(json.dumps(out, indent=2, ensure_ascii=False))
        return

    bar = "=" * 71
    print()
    print(color("1;36", bar))
    print(f"  {color('1;36', 'EVALUATION')}  model={args.model}  time={elapsed_ms:.1f}ms")
    print(
        f"  gold={len(cmp.gold)}  pred={len(cmp.predicted)}  "
        f"correct={cmp.correct_count()}  errors={cmp.error_count()}"
    )
    print(color("1;36", bar))
    print()
    print(f"  Precision: {metric_colored(cmp.precision() * 100)}%")
    print(f"  Recall:    {metric_colored(cmp.recall() * 100)}%")
    print(f"  F1:        {metric_colored(cmp.f1() * 100)}%")
    print()
    _print_matches(cmp)
    print()


def _print_matches(cmp: EvalComparison):
    """output.rs:252-319."""
    gold_by_id = {g.id: g for g in cmp.gold}
    pred_by_id = {p.id: p for p in cmp.predicted}
    for m in cmp.matches:
        kind = m["type"]
        if kind == "correct":
            g = gold_by_id.get(m["gold_id"])
            print(
                f"  {color('32', '+')} {color('32', 'correct')}: "
                f"[{g.label if g else '?'}] \"{g.surface if g else '?'}\""
            )
        elif kind == "type_mismatch":
            g = gold_by_id.get(m["gold_id"])
            print(
                f"  {color('33', '!')} {color('33', 'type mismatch')}: "
                f"\"{g.surface if g else '?'}\" ({m['gold_label']} -> {m['pred_label']})"
            )
        elif kind == "boundary_error":
            g = gold_by_id.get(m["gold_id"])
            p = pred_by_id.get(m["pred_id"])
            print(
                f"  {color('33', '!')} {color('33', 'boundary')}: "
                f"gold=\"{g.surface if g else '?'}\" pred=\"{p.surface if p else '?'}\" "
                f"(IoU={m['iou']:.2f})"
            )
        elif kind == "false_positive":
            p = pred_by_id.get(m["pred_id"])
            print(
                f"  {color('31', 'x')} {color('31', 'false positive')}: "
                f"[{p.label if p else '?'}] \"{p.surface if p else '?'}\""
            )
        else:
            g = gold_by_id.get(m["gold_id"])
            print(
                f"  {color('31', 'x')} {color('31', 'false negative')}: "
                f"[{g.label if g else '?'}] \"{g.surface if g else '?'}\""
            )

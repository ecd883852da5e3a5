"""`dataset` — work with NER datasets: list, info, eval.

Port of anno/src/cli/commands/dataset.rs:55-707 over this engine's
64-dataset registry (sources/datasets.py) and gold corpora.
"""

from __future__ import annotations

import time

from ..backends import create_model
from ..errors import CliError
from ..output import color, metric_colored
from ..utils import types_match_flexible


def run(args):
    if args.action == "list":
        _list()
    elif args.action == "info":
        _info(args.dataset)
    else:
        _eval(args)


def _list():
    """dataset.rs:57-75 + the full registry this engine ships."""
    from ...sources.datasets import DATASETS

    print()
    print(color("1;36", "Available Datasets"))
    print()
    print("  Registered corpora (sources/datasets.py — loadable from disk "
          "in their native formats):")
    by_cat: dict[str, list] = {}
    for key, info in sorted(DATASETS.items()):
        cat = ", ".join(sorted(info.categories)) if info.categories else "other"
        by_cat.setdefault(cat, []).append(key)
    for cat in sorted(by_cat):
        print(f"    [{cat}] {', '.join(by_cat[cat])}")
    print()
    print("  Synthetic (always available):")
    print("    - synthetic   : Generated test cases (29 domains, 170 examples)")
    print("    - robustness  : Adversarial perturbations")
    print()


def _info(dataset: str):
    """dataset.rs:76-132 — registry metadata + gold stats for the
    synthetic corpus (downloading is out of scope, as in the reference's
    eval-advanced gate)."""
    from ...sources.datasets import DATASETS, dataset_from_str

    if dataset == "synthetic":
        from ...eval.synthetic import all_datasets, dataset_stats

        stats = dataset_stats()
        print()
        print(color("1;36", "Dataset: synthetic"))
        print()
        print(f"  Examples: {len(all_datasets())}")
        for k, v in stats.items():
            print(f"  {k}: {v}")
        print()
        return

    key = dataset if dataset in DATASETS else None
    if key is None:
        try:
            key = dataset_from_str(dataset).key
        except Exception:
            raise CliError(
                f"Unknown dataset '{dataset}'. Use 'dataset list' to see "
                "available datasets."
            ) from None
    info = DATASETS[key]
    print()
    print(color("1;36", f"Dataset: {info.name}"))
    print()
    print(f"  Key: {info.key}")
    print(f"  Format: {info.format}")
    print(f"  Categories: {', '.join(sorted(info.categories))}")
    if info.entity_types:
        print(f"  Entity types: {', '.join(info.entity_types)}")
    print("  Status: loadable from disk via sources/datasets.py "
          "(downloading out of scope)")
    print()


def _eval(args):
    """dataset.rs:134-640 — evaluate a backend on a gold corpus; the
    synthetic corpus is the always-available path (flexible type
    matching per utils.rs types_match_flexible)."""
    if args.dataset != "synthetic":
        raise CliError(
            f"Dataset '{args.dataset}' gold is not cached locally; use "
            "--dataset synthetic, or load real gold through "
            "eval.dataset_provider.spark_dataset_provider."
        )
    if args.task != "ner":
        raise CliError(
            f"Task '{args.task}' via the CLI supports 'ner'; coref/relation "
            "evaluation runs through the eval harness "
            "(anno_spark.eval.unified.EvalSystem)."
        )

    from ...eval.synthetic import all_datasets

    model = create_model(args.model)
    examples = all_datasets()

    t0 = time.perf_counter()
    tp = fp = fn_ = 0
    for text, entities, _domain, _difficulty in examples:
        predicted = model(text)
        matched = [False] * len(entities)
        for p in predicted:
            hit = False
            for i, (g_text, g_type, g_start) in enumerate(entities):
                if matched[i]:
                    continue
                g_end = g_start + len(g_text)
                if (p.start == g_start and p.end == g_end
                        and types_match_flexible(p.entity_type, g_type)):
                    matched[i] = True
                    hit = True
                    break
            if hit:
                tp += 1
            else:
                fp += 1
        fn_ += sum(1 for m in matched if not m)
    elapsed_ms = (time.perf_counter() - t0) * 1000.0

    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn_) if tp + fn_ else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    print()
    print(color("1;36", "=" * 60))
    print(f"  Dataset: synthetic | model={args.model} | task={args.task} | "
          f"{len(examples)} examples | {elapsed_ms:.0f}ms")
    print(color("1;36", "=" * 60))
    print()
    print(f"  Precision: {metric_colored(precision * 100)}%")
    print(f"  Recall:    {metric_colored(recall * 100)}%")
    print(f"  F1:        {metric_colored(f1 * 100)}%")
    print(f"  TP={tp} FP={fp} FN={fn_}")
    print()

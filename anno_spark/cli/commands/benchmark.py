"""`benchmark` — comprehensive task×dataset×backend evaluation.

Port of anno/src/cli/commands/benchmark.rs:1-176 over the ported
TaskEvaluator/EvalSystem stack plus the backend comparison harness.
"""

from __future__ import annotations

from ..errors import CliError
from ..output import color, write_output


def run(args):
    if args.suite == "backends":
        # backend_eval.rs surface: rule-tier backends over the synthetic
        # gold corpus with per-domain/difficulty breakdowns
        from ...eval.backend_eval import BackendEvaluator, EvalConfig

        cfg = EvalConfig(max_examples=args.max_examples or 0)
        report = BackendEvaluator.with_config(cfg).run_comprehensive()
        if args.format == "json":
            import json

            out = {
                "timestamp": report.timestamp,
                "total_examples": report.total_examples,
                "backends": [
                    {
                        "name": b.name,
                        "precision": b.overall.precision,
                        "recall": b.overall.recall,
                        "f1": b.overall.f1,
                    }
                    for b in report.backends
                ],
            }
            write_output(json.dumps(out, indent=2) + "\n", args.output)
        else:
            write_output(report.to_markdown() + "\n", args.output)
        return

    if args.suite == "advanced":
        # advanced_harness.rs gold-vs-gold sanity sweep
        from ...eval.advanced_harness import run_all_gold_vs_gold

        for result in run_all_gold_vs_gold():
            print(result.summary())
        return

    if args.suite == "tasks":
        from ...eval.task_evaluator import TaskEvalConfig, TaskEvaluator

        provider = None
        if args.data:
            from ...session import get_spark

            spark = get_spark(app_name="anno-cli-benchmark")
            from ...eval.dataset_provider import spark_dataset_provider

            pairs = [p.split("=", 1) for p in args.data]
            if any(len(p) != 2 for p in pairs):
                raise CliError("--data expects KEY=PATH entries")
            provider = spark_dataset_provider(spark, dict(pairs))

        cfg = TaskEvalConfig(
            datasets=args.datasets or [],
            backends=args.backends or [],
            max_examples=args.max_examples,
        )
        if args.tasks:
            cfg.tasks = list(args.tasks)
        results = TaskEvaluator(provider).evaluate_all(cfg)
        write_output(results.to_markdown() + "\n", args.output)
        s = results.summary
        print(
            f"\n{color('1;36', 'Summary')}: {s.total_combinations} combinations, "
            f"{s.successful} ok, {s.skipped} skipped, {s.failed} failed"
        )
        return

    raise CliError(
        f"Unknown suite '{args.suite}'. Use: backends, advanced, or tasks."
    )

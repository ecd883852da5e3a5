"""Unified evaluation system — single entry point for all evaluations.

Port of anno/src/eval/unified_evaluator.rs:1-902: the ``EvalSystem``
builder (:222-434), weighted per-task/per-dataset/per-backend aggregation
over TaskEvaluator results (:518-691), the bias composition (:693-771),
and the reference's calibration / data-quality placeholder semantics
(:773-895 — both warn and return zeros until fed real predictions /
train-test splits; quirk kept).

Spark-first: the standard evaluation composes the ported TaskEvaluator
(itself Spark-backed where datasets are DataFrames); bias evaluations run
the distributed extraction stack via the ported bias modules when a
SparkSession is supplied to :meth:`EvalSystem.run`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .config_builder import BiasDatasetConfig
from .task_evaluator import TaskEvalConfig, TaskEvaluator


@dataclass
class TaskResults:
    """unified_evaluator.rs:108-116."""

    task: str
    f1: float
    precision: float
    recall: float
    num_examples: int


@dataclass
class DatasetResults:
    """unified_evaluator.rs:119-127."""

    dataset: str
    f1: float
    precision: float
    recall: float
    num_examples: int


@dataclass
class BackendResults:
    """unified_evaluator.rs:130-138."""

    backend: str
    f1: float
    precision: float
    recall: float
    num_examples: int


@dataclass
class StandardEvalResults:
    """unified_evaluator.rs:90-105."""

    f1: float
    precision: float
    recall: float
    per_task: dict = field(default_factory=dict)
    per_dataset: dict = field(default_factory=dict)
    per_backend: dict = field(default_factory=dict)


@dataclass
class GenderBiasSummary:
    """unified_evaluator.rs:155-161."""

    bias_gap: float
    pro_stereotype_accuracy: float
    anti_stereotype_accuracy: float


@dataclass
class DemographicBiasSummary:
    """unified_evaluator.rs:164-170."""

    ethnicity_parity_gap: float
    script_bias_gap: float
    overall_recognition_rate: float


@dataclass
class TemporalBiasSummary:
    """unified_evaluator.rs:173-179."""

    historical_modern_gap: float
    historical_rate: float
    modern_rate: float


@dataclass
class LengthBiasSummary:
    """unified_evaluator.rs:182-188."""

    short_vs_long_gap: float
    short_entity_f1: float
    long_entity_f1: float


@dataclass
class BiasEvalResults:
    """unified_evaluator.rs:141-152."""

    gender: GenderBiasSummary | None = None
    demographic: DemographicBiasSummary | None = None
    temporal: TemporalBiasSummary | None = None
    length: LengthBiasSummary | None = None


@dataclass
class CalibrationEvalResults:
    """unified_evaluator.rs:191-197."""

    ece: float = 0.0
    mce: float = 0.0
    brier_score: float = 0.0


@dataclass
class DataQualityEvalResults:
    """unified_evaluator.rs:200-206."""

    leakage_detected: bool = False
    redundancy_rate: float = 0.0
    ambiguous_count: int = 0


@dataclass
class EvalMetadata:
    """unified_evaluator.rs:209-215."""

    timestamp: str
    model_name: str | None
    total_duration_ms: float | None
    num_examples: int


@dataclass
class UnifiedEvalResults:
    """unified_evaluator.rs:64-87."""

    standard: StandardEvalResults | None
    bias: BiasEvalResults | None
    calibration: CalibrationEvalResults | None
    data_quality: DataQualityEvalResults | None
    warnings: list
    metadata: EvalMetadata


class EvalSystem:
    """unified_evaluator.rs:222-434 — fluent builder, one ``run()``."""

    def __init__(self):
        self.tasks: list = []
        self.datasets: list = []
        self.backends: list = []
        self.max_examples: int | None = None
        self.seed: int | None = 42
        self.include_bias = False
        self.bias_config: BiasDatasetConfig | None = None
        self.include_calibration = False
        self.include_data_quality = False
        self.model = None  # extract callable text -> list[Mention]
        self.model_name: str | None = None
        self.dataset_provider = None  # (dataset_key, task) -> cases | None

    @classmethod
    def new(cls) -> "EvalSystem":
        return cls()

    # builder methods (unified_evaluator.rs:283-434)
    def with_tasks(self, tasks):
        self.tasks = list(tasks)
        return self

    def with_datasets(self, datasets):
        self.datasets = list(datasets)
        return self

    def with_backends(self, backends):
        self.backends = list(backends)
        return self

    def with_max_examples(self, max_examples):
        self.max_examples = max_examples
        return self

    def add_task(self, task):
        if task not in self.tasks:
            self.tasks.append(task)
        return self

    def add_dataset(self, dataset):
        if dataset not in self.datasets:
            self.datasets.append(dataset)
        return self

    def add_backend(self, backend):
        if backend not in self.backends:
            self.backends.append(backend)
        return self

    def with_seed(self, seed: int):
        self.seed = seed
        return self

    def with_bias_analysis(self, enable: bool):
        self.include_bias = enable
        if enable and self.bias_config is None:
            self.bias_config = (
                BiasDatasetConfig().with_frequency_weighting().with_validation()
            )
        return self

    def with_bias_config(self, config: BiasDatasetConfig):
        self.bias_config = config
        self.include_bias = True
        return self

    def with_calibration(self, enable: bool):
        self.include_calibration = enable
        return self

    def with_data_quality(self, enable: bool):
        self.include_data_quality = enable
        return self

    def with_model(self, model, name: str | None = None):
        self.model = model
        self.model_name = name
        return self

    def with_dataset_provider(self, provider):
        """The engine's counterpart of the reference's dataset cache:
        (dataset_key, task) -> cases (see eval/dataset_provider.py)."""
        self.dataset_provider = provider
        return self

    # ------------------------------------------------------------------

    def run(self, spark=None) -> UnifiedEvalResults:
        """unified_evaluator.rs:437-516.  ``spark`` powers the bias
        evaluations (distributed extraction); standard evaluation runs
        through the ported TaskEvaluator either way."""
        start = time.perf_counter()
        warnings: list[str] = []

        standard = self._run_standard(warnings)

        bias = None
        if self.include_bias:
            if spark is None:
                warnings.append(
                    "Bias evaluation failed: requires a SparkSession "
                    "(pass spark to run())."
                )
            else:
                try:
                    bias = self._run_bias(spark)
                except Exception as e:  # quirk: swallowed into warnings (:449-459)
                    warnings.append(f"Bias evaluation failed: {e}")

        calibration = None
        if self.include_calibration and self.model is not None:
            calibration = self._run_calibration(warnings)

        data_quality = None
        if self.include_data_quality:
            data_quality = self._run_data_quality(warnings)

        duration_ms = (time.perf_counter() - start) * 1000.0
        num_examples = (
            sum(t.num_examples for t in standard.per_task.values())
            if standard
            else 0
        )
        return UnifiedEvalResults(
            standard=standard,
            bias=bias,
            calibration=calibration,
            data_quality=data_quality,
            warnings=warnings,
            metadata=EvalMetadata(
                timestamp=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                model_name=self.model_name,
                total_duration_ms=duration_ms,
                num_examples=num_examples,
            ),
        )

    # ------------------------------------------------------------------

    def _run_standard(self, warnings) -> StandardEvalResults | None:
        """unified_evaluator.rs:524-691 — empty tasks/datasets/backends
        mean "all"; aggregation is example-weighted."""
        config = TaskEvalConfig(
            datasets=list(self.datasets),
            backends=list(self.backends),
            max_examples=self.max_examples,
            seed=self.seed,
        )
        if self.tasks:
            config.tasks = list(self.tasks)
        if not config.tasks:
            return None

        comprehensive = TaskEvaluator(self.dataset_provider).evaluate_all(config)

        per_task: dict[str, TaskResults] = {}
        per_dataset: dict[str, DatasetResults] = {}
        per_backend: dict[str, BackendResults] = {}
        tot_f1 = tot_p = tot_r = 0.0
        tot_n = 0

        def _fold(store, key, cls, label_field, f1, p, r, n):
            cur = store.get(key)
            if cur is None:
                store[key] = cls(**{label_field: key}, f1=f1, precision=p,
                                 recall=r, num_examples=n)
                return
            old, new = float(cur.num_examples), float(n)
            total = old + new
            if total > 0:
                cur.f1 = (cur.f1 * old + f1 * new) / total
                cur.precision = (cur.precision * old + p * new) / total
                cur.recall = (cur.recall * old + r * new) / total
            cur.num_examples += n

        for result in comprehensive.results:
            if not result.success:
                continue
            f1 = result.metrics.get("f1", 0.0)
            p = result.metrics.get("precision", 0.0)
            r = result.metrics.get("recall", 0.0)
            n = result.num_examples
            tot_f1 += f1 * n
            tot_p += p * n
            tot_r += r * n
            tot_n += n
            _fold(per_task, result.task, TaskResults, "task", f1, p, r, n)
            _fold(per_dataset, result.dataset, DatasetResults, "dataset", f1, p, r, n)
            _fold(per_backend, result.backend, BackendResults, "backend", f1, p, r, n)

        if tot_n > 0:
            return StandardEvalResults(
                f1=tot_f1 / tot_n, precision=tot_p / tot_n, recall=tot_r / tot_n,
                per_task=per_task, per_dataset=per_dataset, per_backend=per_backend,
            )
        return StandardEvalResults(0.0, 0.0, 0.0, per_task, per_dataset, per_backend)

    def _run_bias(self, spark) -> BiasEvalResults:
        """unified_evaluator.rs:693-771 — compose the four ported bias
        evaluators; each runs the real distributed extraction stack."""
        from pyspark.sql import functions as F

        from . import demographic_bias as demo
        from .gender_bias import evaluate_gender_bias
        from .length_bias import bucket_rates, evaluate_length_bias
        from .length_bias import recognition_table as length_recognition
        from .temporal_bias import evaluate_temporal_bias

        # Gender (SimpleCorefResolver in the reference, :713-725)
        report, _per_occ, _per_pron = evaluate_gender_bias(spark, resolver="simple")
        g = report.collect()[0]
        gender = GenderBiasSummary(
            bias_gap=g["bias_gap"],
            pro_stereotype_accuracy=g["pro_stereotype_accuracy"],
            anti_stereotype_accuracy=g["anti_stereotype_accuracy"],
        )

        # Demographic (:727-735)
        recognition = demo.name_recognition(spark)
        d = demo.bias_summary(recognition).collect()[0]
        demographic = DemographicBiasSummary(
            ethnicity_parity_gap=d["ethnicity_parity_gap"],
            script_bias_gap=d["script_bias_gap"],
            overall_recognition_rate=d["overall_recognition_rate"],
        )

        # Temporal (:737-745)
        t = evaluate_temporal_bias(spark).collect()[0]
        temporal = TemporalBiasSummary(
            historical_modern_gap=t["historical_modern_gap"],
            historical_rate=t["historical_rate"],
            modern_rate=t["modern_rate"],
        )

        # Length (:747-763): gap from the report; the per-bucket f1s the
        # reference reads out of by_word_bucket come from bucket_rates
        length_report = evaluate_length_bias(spark).collect()[0]
        from .length_bias import annotate_lengths, length_varied_dataset

        ex = annotate_lengths(length_varied_dataset(spark))
        from ..operators.extract import extract_documents, mentions_table

        mentions = mentions_table(
            extract_documents(ex.select("url", F.col("sentence").alias("text")))
        )
        rates = bucket_rates(length_recognition(ex, mentions))
        word_rates = {
            row["bucket"]: row["rate"]
            for row in rates.where(F.col("dimension") == "word").collect()
        }
        length = LengthBiasSummary(
            short_vs_long_gap=length_report["short_vs_long_gap"],
            short_entity_f1=word_rates.get("SingleWord", 0.0),
            long_entity_f1=word_rates.get("FourPlusWords", 0.0),
        )

        return BiasEvalResults(gender, demographic, temporal, length)

    def _run_calibration(self, warnings) -> CalibrationEvalResults:
        """unified_evaluator.rs:773-862 — the reference skips entities
        whose extraction method isn't calibrated; the rule tier never is,
        so this returns placeholder zeros with the same warning (quirk)."""
        warnings.append(
            "No datasets configured for calibration. Using synthetic test data."
            if not self.datasets
            else "Calibration using configured datasets requires dataset "
                 "loading (not yet fully implemented). Using synthetic data."
        )
        test_texts = [
            "John Smith works at Google in New York.",
            "Jane Doe is a professor at MIT.",
            "Microsoft was founded by Bill Gates.",
        ]
        # Run the model for side-effect parity; rule-tier confidences are
        # uncalibrated (provenance.method.is_calibrated() false, :818-828),
        # so every entity is skipped and the predictions list stays empty.
        for text in test_texts:
            self.model(text)
        warnings.append(
            "No calibrated entities found for calibration analysis. "
            "Model may not provide calibrated confidence scores."
        )
        return CalibrationEvalResults(0.0, 0.0, 0.0)

    def _run_data_quality(self, warnings) -> DataQualityEvalResults:
        """unified_evaluator.rs:864-895 — placeholder + warning until a
        train/test split is supplied (the real analyzer lives in
        eval/dataset_quality.py for callers that have DataFrames)."""
        if not self.datasets:
            warnings.append(
                "No datasets configured for data quality checks. Cannot "
                "check for leakage without train/test split."
            )
            return DataQualityEvalResults(False, 0.0, 0)
        warnings.append(
            "Data quality checks require dataset loading (not yet fully "
            "implemented). Returning placeholder results."
        )
        return DataQualityEvalResults(False, 0.0, 0)

"""Fluent builders for evaluation configs.

Port of anno/src/eval/config_builder.rs:1-252: TaskEvalConfigBuilder
(:16-165) building :class:`anno_spark.eval.task_evaluator.TaskEvalConfig`,
and BiasDatasetConfigBuilder (:169-252) building the bias-run options
dict the bias evaluators consume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .task_evaluator import TaskEvalConfig


@dataclass
class TaskEvalConfigBuilder:
    """config_builder.rs:16-165 — defaults match the reference
    (:149-164): seed 42, relation threshold 0.5, CIs on."""

    tasks: list = field(default_factory=list)
    datasets: list = field(default_factory=list)
    backends: list = field(default_factory=list)
    max_examples: int | None = None
    seed: int | None = 42
    _require_cached: bool = False
    relation_threshold: float = 0.5
    robustness: bool = False
    compute_familiarity: bool = True
    temporal_stratification: bool = False
    confidence_intervals: bool = True

    @classmethod
    def new(cls) -> "TaskEvalConfigBuilder":
        return cls()

    def with_tasks(self, tasks):
        self.tasks = list(tasks)
        return self

    def add_task(self, task):
        if task not in self.tasks:
            self.tasks.append(task)
        return self

    def with_datasets(self, datasets):
        self.datasets = list(datasets)
        return self

    def add_dataset(self, dataset):
        if dataset not in self.datasets:
            self.datasets.append(dataset)
        return self

    def with_backends(self, backends):
        self.backends = list(backends)
        return self

    def add_backend(self, backend):
        if backend not in self.backends:
            self.backends.append(backend)
        return self

    def with_max_examples(self, max_examples: int):
        self.max_examples = max_examples
        return self

    def with_seed(self, seed: int):
        self.seed = seed
        return self

    def require_cached(self, require: bool):
        self._require_cached = require
        return self

    def with_relation_threshold(self, threshold: float):
        self.relation_threshold = threshold
        return self

    def with_robustness(self, enable: bool):
        self.robustness = enable
        return self

    def with_familiarity(self, enable: bool):
        self.compute_familiarity = enable
        return self

    def with_temporal_stratification(self, enable: bool):
        self.temporal_stratification = enable
        return self

    def with_confidence_intervals(self, enable: bool):
        self.confidence_intervals = enable
        return self

    def build(self) -> TaskEvalConfig:
        """config_builder.rs:129-145 — robustness/familiarity/temporal
        flags ride along for callers that stratify themselves (the
        ported TaskEvaluator keys on tasks/datasets/backends/limits)."""
        cfg = TaskEvalConfig(
            datasets=list(self.datasets),
            backends=list(self.backends),
            max_examples=self.max_examples,
            seed=self.seed,
            require_cached=self._require_cached,
            relation_threshold=self.relation_threshold,
            confidence_intervals=self.confidence_intervals,
        )
        if self.tasks:
            cfg.tasks = list(self.tasks)
        return cfg


@dataclass
class BiasDatasetConfig:
    """bias_config.rs — the options block the bias evaluators read."""

    frequency_weighted: bool = False
    validate_distributions: bool = False
    min_samples_per_category: int = 10
    evaluation_seeds: list = field(default_factory=lambda: [42])
    confidence_level: float = 0.95
    detailed: bool = False

    def with_frequency_weighting(self) -> "BiasDatasetConfig":
        self.frequency_weighted = True
        return self

    def with_validation(self) -> "BiasDatasetConfig":
        self.validate_distributions = True
        return self


@dataclass
class BiasDatasetConfigBuilder:
    """config_builder.rs:169-252 — defaults at :237-249."""

    frequency_weighted: bool = False
    validate_distributions: bool = False
    min_samples_per_category: int = 10
    evaluation_seeds: list = field(default_factory=lambda: [42])
    confidence_level: float = 0.95
    detailed: bool = False

    @classmethod
    def new(cls) -> "BiasDatasetConfigBuilder":
        return cls()

    def with_frequency_weighting(self, enable: bool):
        self.frequency_weighted = enable
        return self

    def with_validation(self, enable: bool):
        self.validate_distributions = enable
        return self

    def with_min_samples(self, min_samples: int):
        self.min_samples_per_category = min_samples
        return self

    def with_seeds(self, seeds):
        self.evaluation_seeds = list(seeds)
        return self

    def add_seed(self, seed: int):
        self.evaluation_seeds.append(seed)
        return self

    def with_confidence_level(self, level: float):
        self.confidence_level = level
        return self

    def with_detailed(self, detailed: bool):
        self.detailed = detailed
        return self

    def build(self) -> BiasDatasetConfig:
        return BiasDatasetConfig(
            frequency_weighted=self.frequency_weighted,
            validate_distributions=self.validate_distributions,
            min_samples_per_category=self.min_samples_per_category,
            evaluation_seeds=list(self.evaluation_seeds),
            confidence_level=self.confidence_level,
            detailed=self.detailed,
        )

"""Bounded confidence/score types and their column-expression forms.

Behavioral port of the reference's type-safe confidence wrappers
(reference: anno/src/types/confidence.rs:135-260 and
anno/src/types/score.rs:46-135): values validated into [0,1], logit ->
probability via sigmoid with optional temperature scaling, geometric-
mean combination, lerp, and the high/low thresholds.

Python side: small frozen wrappers used by per-document code.  Spark
side: the same formulas as ``pyspark.sql.functions`` expressions so
confidence math stays in whole-stage codegen over mention tables.

Quirks preserved: NaN saturates to 0.0 (confidence.rs:168-175);
non-positive temperature leaves the logit unscaled (score.rs:92-100);
Confidence defaults to CERTAIN (1.0) while Score defaults to MAX.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = ["Confidence", "Score",
           "sigmoid_expr", "combine_confidence_expr", "lerp_expr"]


@dataclass(frozen=True)
class Confidence:
    """f64 confidence in [0,1] (confidence.rs:135-232)."""

    value: float

    @staticmethod
    def new(value: float):
        """None if out of range or NaN (confidence.rs:155-162)."""
        if math.isnan(value) or not 0.0 <= value <= 1.0:
            return None
        return Confidence(value)

    @staticmethod
    def saturating(value: float) -> "Confidence":
        """Clamp; NaN -> 0.0 (confidence.rs:168-175)."""
        if math.isnan(value):
            return Confidence(0.0)
        return Confidence(min(max(value, 0.0), 1.0))

    @staticmethod
    def from_percent(percent: float):
        return Confidence.new(percent / 100.0)

    @staticmethod
    def certain() -> "Confidence":
        return Confidence(1.0)

    @staticmethod
    def uncertain() -> "Confidence":
        return Confidence(0.5)

    def get(self) -> float:
        return self.value

    def as_percent(self) -> float:
        return self.value * 100.0

    def is_high(self) -> bool:
        return self.value >= 0.9

    def is_low(self) -> bool:
        return self.value < 0.5

    def lerp(self, other: "Confidence", t: float) -> "Confidence":
        t = min(max(t, 0.0), 1.0)
        return Confidence.saturating(
            self.value * (1.0 - t) + other.value * t)

    def combine(self, other: "Confidence") -> "Confidence":
        """Geometric mean — penalizes low scores more than arithmetic
        (confidence.rs:228-232)."""
        return Confidence(math.sqrt(self.value * other.value))


@dataclass(frozen=True)
class Score:
    """f32 model score in [0,1] (score.rs:46-135)."""

    value: float

    @staticmethod
    def new(value: float):
        if math.isnan(value) or not 0.0 <= value <= 1.0:
            return None
        return Score(value)

    @staticmethod
    def saturating(value: float) -> "Score":
        if math.isnan(value):
            return Score(0.0)
        return Score(min(max(value, 0.0), 1.0))

    @staticmethod
    def from_logit(logit: float) -> "Score":
        return Score(1.0 / (1.0 + math.exp(-logit)))

    @staticmethod
    def from_logit_with_temperature(logit: float,
                                    temperature: float) -> "Score":
        """T>1 softens, T<1 sharpens; T<=0 leaves the logit unscaled
        (score.rs:92-100)."""
        scaled = logit / temperature if temperature > 0.0 else logit
        return Score.from_logit(scaled)

    def get(self) -> float:
        return self.value

    def to_confidence(self) -> Confidence:
        return Confidence.saturating(self.value)

    def is_high(self) -> bool:
        return self.value >= 0.9

    def passes(self, threshold: float) -> bool:
        return self.value >= threshold


# ---------------------------------------------------------------------------
# column-expression forms (JVM-side, no UDF)


def sigmoid_expr(logit_col, temperature: float | None = None):
    """Score::from_logit(_with_temperature) as a codegen expression."""
    from pyspark.sql import functions as F

    x = F.col(logit_col) if isinstance(logit_col, str) else logit_col
    if temperature is not None and temperature > 0.0:
        x = x / F.lit(float(temperature))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def combine_confidence_expr(a, b):
    """Geometric-mean combine as a codegen expression."""
    from pyspark.sql import functions as F

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.sqrt(ca * cb)


def lerp_expr(a, b, t: float):
    """Confidence::lerp as a codegen expression (t clamped)."""
    from pyspark.sql import functions as F

    t = min(max(t, 0.0), 1.0)
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.least(F.greatest(ca * F.lit(1.0 - t) + cb * F.lit(t),
                              F.lit(0.0)), F.lit(1.0))

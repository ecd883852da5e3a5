"""Box embeddings: geometric entity representations for coreference.

Behavioral port of the reference's box-embedding inference layer
(reference: anno/src/backends/box_embeddings.rs:1-965) and the
box-based coreference resolver (anno/src/eval/coref_resolver.rs:
1096-1240).  Entities are axis-aligned hyperrectangles; coreference is
mutual conditional probability P(A|B) = Vol(A∩B)/Vol(B) (BERE, Lee et
al. 2022).  Temporal boxes follow BoxTE (Messner et al. 2022),
uncertainty-aware boxes follow UKGE (Chen et al. 2021) — all public
papers cited by the reference's own doc comments.

Everything here is pure numpy over ``(n, d)`` / ``(d,)`` arrays so the
same code vectorizes a whole pair batch inside a pandas UDF.  The
distributed surface (grid-blocked pair generation, JVM-side scoring)
lives in :mod:`anno_spark.operators.boxes`.

Reference quirks preserved (do NOT "fix"):

* ``conditional_probability`` returns 0.0 when the conditioning box
  has zero volume (box_embeddings.rs:236-241) — even if the boxes are
  identical points.
* ``GumbelBox.robust_coreference`` counts grid points with a trailing
  ``count >= samples`` break, so the sample count can exceed the
  requested ``samples`` by up to one full carry round
  (box_embeddings.rs:664-698); parity requires the same loop shape.
* ``UncertainBox.detect_conflict`` hard-codes confidence threshold 0.8
  and the ``overlap < 0.1 * min_vol`` disjointness test
  (box_embeddings.rs:466-486).
* The box resolver's "syntactic constraints" are distance heuristics
  (>50 chars for Principle B, >20 for Principle C), not real
  c-command checks (coref_resolver.rs:1190-1221).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "volume",
    "intersection_volume",
    "conditional_probability",
    "coreference_score",
    "is_contained_in",
    "is_disjoint",
    "box_from_vector",
    "box_from_vector_adaptive",
    "center",
    "size",
    "interaction_strength",
    "acquisition_roles",
    "TemporalBox",
    "UncertainBox",
    "Conflict",
    "GumbelBox",
    "BoxCorefConfig",
    "resolve_with_boxes",
]


# ---------------------------------------------------------------------------
# core geometry (box_embeddings.rs:33-218)
#
# All functions take ``min``/``max`` arrays whose LAST axis is the box
# dimension, so they work elementwise over arbitrarily batched pairs:
# (d,) scalars, (n, d) rows, or broadcast (n, 1, d) x (1, m, d) grids.


def _as_f32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def volume(box_min, box_max) -> np.ndarray:
    """Vol = ∏ max(max_i - min_i, 0)  (box_embeddings.rs:75-83)."""
    w = np.maximum(_as_f32(box_max) - _as_f32(box_min), 0.0)
    return np.prod(w, axis=-1)


def intersection_volume(a_min, a_max, b_min, b_max) -> np.ndarray:
    """Per-dimension overlap product; 0 when disjoint (rs:89-108)."""
    lo = np.maximum(_as_f32(a_min), _as_f32(b_min))
    hi = np.minimum(_as_f32(a_max), _as_f32(b_max))
    return np.prod(np.maximum(hi - lo, 0.0), axis=-1)


def conditional_probability(a_min, a_max, b_min, b_max) -> np.ndarray:
    """P(A|B) = Vol(A∩B)/Vol(B); 0.0 when Vol(B) == 0 (rs:229-243)."""
    vol_b = volume(b_min, b_max)
    inter = intersection_volume(a_min, a_max, b_min, b_max)
    out = np.divide(inter, vol_b, out=np.zeros_like(inter), where=vol_b != 0.0)
    return out


def coreference_score(a_min, a_max, b_min, b_max) -> np.ndarray:
    """(P(A|B) + P(B|A)) / 2 (rs:252-257)."""
    p_ab = conditional_probability(a_min, a_max, b_min, b_max)
    p_ba = conditional_probability(b_min, b_max, a_min, a_max)
    return (p_ab + p_ba) / 2.0


def is_contained_in(a_min, a_max, b_min, b_max) -> np.ndarray:
    """self ⊆ other in every dimension (rs:263-273)."""
    a_min, a_max = _as_f32(a_min), _as_f32(a_max)
    b_min, b_max = _as_f32(b_min), _as_f32(b_max)
    return np.logical_and(b_min <= a_min, a_max <= b_max).all(axis=-1)


def is_disjoint(a_min, a_max, b_min, b_max) -> np.ndarray:
    """Zero intersection volume (rs:276-279)."""
    return intersection_volume(a_min, a_max, b_min, b_max) == 0.0


def box_from_vector(vector, radius: float):
    """Hypercube of half-width ``radius`` around a point (rs:297-303)."""
    v = _as_f32(vector)
    return v - np.float32(radius), v + np.float32(radius)


def box_from_vector_adaptive(vector, radius_factor: float = 0.1):
    """Radius = |v| * factor + 0.01 (rs:313-318)."""
    v = _as_f32(vector)
    magnitude = np.sqrt(np.sum(v * v, axis=-1, keepdims=True))
    radius = magnitude * np.float32(radius_factor) + np.float32(0.01)
    return v - radius, v + radius


def center(box_min, box_max) -> np.ndarray:
    """Midpoint per dimension (rs:324-331)."""
    return (_as_f32(box_min) + _as_f32(box_max)) / 2.0


def size(box_min, box_max) -> np.ndarray:
    """Width per dimension, clamped at 0 (rs:335-341)."""
    return np.maximum(_as_f32(box_max) - _as_f32(box_min), 0.0)


# ---------------------------------------------------------------------------
# interaction modeling (box_embeddings.rs:504-560)


def interaction_strength(actor, action, target) -> float:
    """P(action, target | actor) ≈ min of pairwise intersections / Vol(actor).

    ``actor``/``action``/``target`` are (min, max) tuples.  The
    reference approximates the 3-way intersection by the minimum of the
    three pairwise intersection volumes (rs:523-541).
    """
    actor_min, actor_max = actor
    action_min, action_max = action
    target_min, target_max = target
    aa = intersection_volume(actor_min, actor_max, action_min, action_max)
    at = intersection_volume(action_min, action_max, target_min, target_max)
    ar = intersection_volume(actor_min, actor_max, target_min, target_max)
    inter = np.minimum(np.minimum(aa, at), ar)
    vol_actor = volume(actor_min, actor_max)
    return float(inter / vol_actor) if vol_actor != 0.0 else 0.0


def acquisition_roles(entity_a, entity_b, acquisition) -> tuple:
    """(buyer_role, seller_role) via asymmetric interaction (rs:552-560)."""
    return (
        interaction_strength(entity_a, acquisition, entity_b),
        interaction_strength(entity_b, acquisition, entity_a),
    )


# ---------------------------------------------------------------------------
# temporal boxes (BoxTE; box_embeddings.rs:246-390)


@dataclass
class TemporalBox:
    """Box that translates/resizes linearly over a validity window.

    ``base`` bounds hold at ``time_range[0]``; velocity deltas apply per
    unit of ``time - time_range[0]`` (box_embeddings.rs:330-352).
    """

    base_min: np.ndarray
    base_max: np.ndarray
    min_delta: np.ndarray
    max_delta: np.ndarray
    time_start: float
    time_end: float

    def __post_init__(self):
        self.base_min = _as_f32(self.base_min)
        self.base_max = _as_f32(self.base_max)
        self.min_delta = _as_f32(self.min_delta)
        self.max_delta = _as_f32(self.max_delta)
        if not (self.base_min.shape == self.base_max.shape
                == self.min_delta.shape == self.max_delta.shape):
            raise ValueError("base and velocity must have same dimension")

    @classmethod
    def static(cls, box_min, box_max, time_range: tuple) -> "TemporalBox":
        """Zero-velocity box (BoxVelocity::static_velocity, rs:299-305)."""
        d = len(box_min)
        return cls(box_min, box_max, np.zeros(d, np.float32),
                   np.zeros(d, np.float32), time_range[0], time_range[1])

    def is_valid_at(self, time: float) -> bool:
        """Half-open range [start, end) (rs:384-387)."""
        return self.time_start <= time < self.time_end

    def at_time(self, time: float):
        """Box bounds at ``time``; None outside the window (rs:330-352)."""
        if not self.is_valid_at(time):
            return None
        dt = np.float32(time - self.time_start)
        return (self.base_min + self.min_delta * dt,
                self.base_max + self.max_delta * dt)

    def coreference_at_time(self, other: "TemporalBox", time: float) -> float:
        """0.0 if either box is invalid at ``time`` (rs:357-370)."""
        a = self.at_time(time)
        b = other.at_time(time)
        if a is None or b is None:
            return 0.0
        return float(coreference_score(a[0], a[1], b[0], b[1]))


# ---------------------------------------------------------------------------
# uncertainty-aware boxes (UKGE; box_embeddings.rs:393-500)


@dataclass
class Conflict:
    """Contradiction between two high-confidence disjoint claims."""

    claim_a_trust: float
    claim_b_trust: float
    severity: float


@dataclass
class UncertainBox:
    """Box whose volume encodes (inverse) confidence (rs:424-487)."""

    box_min: np.ndarray
    box_max: np.ndarray
    source_trust: float

    def __post_init__(self):
        if not 0.0 <= self.source_trust <= 1.0:
            raise ValueError("source_trust must be in [0.0, 1.0]")
        self.box_min = _as_f32(self.box_min)
        self.box_max = _as_f32(self.box_max)

    def confidence(self) -> float:
        """1 / (1 + volume): smaller box = higher confidence (rs:449-456)."""
        return float(1.0 / (1.0 + volume(self.box_min, self.box_max)))

    def detect_conflict(self, other: "UncertainBox"):
        """High-confidence disjoint claims conflict (rs:463-487).

        Thresholds transcribed: overlap < 10% of the smaller volume AND
        both confidences > 0.8.  Severity blends disjointness with mean
        confidence.
        """
        overlap = float(intersection_volume(self.box_min, self.box_max,
                                            other.box_min, other.box_max))
        min_vol = min(float(volume(self.box_min, self.box_max)),
                      float(volume(other.box_min, other.box_max)))
        conf_a = self.confidence()
        conf_b = other.confidence()
        if overlap < min_vol * 0.1 and conf_a > 0.8 and conf_b > 0.8:
            return Conflict(
                claim_a_trust=self.source_trust,
                claim_b_trust=other.source_trust,
                severity=(1.0 - overlap / max(min_vol, 1e-6))
                * (conf_a + conf_b) / 2.0,
            )
        return None


# ---------------------------------------------------------------------------
# Gumbel boxes (box_embeddings.rs:563-700)


@dataclass
class GumbelBox:
    """Box with sigmoid-soft walls; temperature controls fuzziness."""

    mean_min: np.ndarray
    mean_max: np.ndarray
    temperature: float

    def __post_init__(self):
        if self.temperature <= 0.0:
            raise ValueError("temperature must be positive")
        self.mean_min = _as_f32(self.mean_min)
        self.mean_max = _as_f32(self.mean_max)

    def membership_probability(self, point) -> float:
        """∏ sigmoid((x-min)/T) * sigmoid((max-x)/T) (rs:625-645)."""
        x = _as_f32(point)
        t = np.float32(self.temperature)
        min_prob = 1.0 / (1.0 + np.exp(-(x - self.mean_min) / t))
        max_prob = 1.0 / (1.0 + np.exp(-(self.mean_max - x) / t))
        return float(np.prod(min_prob * max_prob, axis=-1))

    def robust_coreference(self, other: "GumbelBox", samples: int) -> float:
        """Deterministic grid sample of self, averaged membership in other.

        Loop shape transcribed exactly (rs:655-699): odometer-style grid
        enumeration with the terminal ``carry or count >= samples``
        break, so the effective sample count matches the reference.
        """
        dim = len(self.mean_min)
        samples_per_dim = int(math.ceil(samples ** (1.0 / dim)))
        total_prob = 0.0
        count = 0
        indices = [0] * dim
        denom = max(samples_per_dim - 1, 1)
        while True:
            point = self.mean_min + (
                np.array(indices, np.float32) / np.float32(denom)
            ) * (self.mean_max - self.mean_min)
            total_prob += other.membership_probability(point)
            count += 1
            carry = True
            for i in range(dim):
                if carry:
                    indices[i] += 1
                    if indices[i] >= samples_per_dim:
                        indices[i] = 0
                        carry = True
                    else:
                        carry = False
            if carry or count >= samples:
                break
        return total_prob / count


# ---------------------------------------------------------------------------
# box-based coreference resolver (coref_resolver.rs:1096-1240)

_PRONOUNS = frozenset(
    ["he", "she", "they", "him", "her", "them", "it", "this", "that"])


@dataclass
class BoxCorefConfig:
    """Defaults transcribed from box_embeddings.rs:232-243."""

    coreference_threshold: float = 0.7
    enforce_syntactic_constraints: bool = True
    max_local_distance: int = 5
    vector_to_box_radius: float | None = 0.1


def _is_pronoun(text: str) -> bool:
    return text.lower() in _PRONOUNS


def _is_rexpression(text: str) -> bool:
    return len(text) > 1 and text[:1].isupper()


def _syntactic_ok(a, b, max_local_distance: int) -> bool:
    """Distance heuristics standing in for Principle B/C checks.

    ``a``/``b`` are (text, start, end).  Transcribed thresholds: a
    pronoun within the local window may only corefer at distance > 50
    ("rough sentence boundary"); an R-expression at distance > 20
    (coref_resolver.rs:1190-1221).
    """
    text_a, start_a, end_a = a
    text_b, start_b, end_b = b
    if end_a <= start_b:
        distance = start_b - end_a
    else:
        distance = max(start_a - end_b, 0)
    if _is_pronoun(text_a) and distance <= max_local_distance:
        return distance > 50
    if _is_rexpression(text_a) and distance <= max_local_distance:
        return distance > 20
    return True


def resolve_with_boxes(entities: list, box_min, box_max,
                       config: BoxCorefConfig | None = None) -> list:
    """Cluster entities whose boxes mutually overlap above threshold.

    ``entities`` is a list of ``(text, entity_type, start, end)`` tuples;
    ``box_min``/``box_max`` are (n, d) arrays aligned by index.  Returns
    a list of cluster ids (one per entity) assigned in first-seen order,
    matching the reference's union-find + cluster-map walk
    (coref_resolver.rs:1122-1186).  Links require score >= threshold AND
    equal entity_type AND (if enabled) the syntactic heuristics.
    """
    config = config or BoxCorefConfig()
    n = len(entities)
    if n == 0:
        return []
    box_min = _as_f32(box_min)
    box_max = _as_f32(box_max)
    if len(box_min) != n or len(box_max) != n:
        raise ValueError("entities and boxes must have same length")

    # all-pairs scores in one vectorized broadcast (n is per-document small)
    scores = coreference_score(box_min[:, None, :], box_max[:, None, :],
                               box_min[None, :, :], box_max[None, :, :])

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if scores[i, j] < config.coreference_threshold:
                continue
            if entities[i][1] != entities[j][1]:
                continue
            if config.enforce_syntactic_constraints and not _syntactic_ok(
                (entities[i][0], entities[i][2], entities[i][3]),
                (entities[j][0], entities[j][2], entities[j][3]),
                config.max_local_distance,
            ):
                continue
            pi, pj = find(i), find(j)
            if pi != pj:
                parent[pi] = pj

    cluster_map: dict = {}
    out = []
    for i in range(n):
        root = find(i)
        if root not in cluster_map:
            cluster_map[root] = len(cluster_map)
        out.append(cluster_map[root])
    return out

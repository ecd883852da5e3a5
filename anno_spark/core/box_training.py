"""Box-embedding training: learn boxes from coreference annotations.

Behavioral port of the reference trainer (reference:
anno/src/backends/box_embeddings_training.rs:1-1785).  The objective
maximizes conditional probability for coreferent pairs and hinges it
below a margin for cross-chain pairs; boxes are reparameterized as
``min = mu - exp(delta)/2, max = mu + exp(delta)/2`` so they stay valid
(training.rs:56-68), optimized with AMSGrad and the reference's
hand-tuned gradient heuristics transcribed tier by tier.

Scale note: training state is one (mu, delta) row per mention — a small
model trained driver-side on a bounded sample of documents, exactly like
the engine's other trained artifacts (IVF centroids, TF-IDF vocabulary).
The expensive parts — pair generation from chains and scoring trained
boxes over the corpus — run distributed in
:mod:`anno_spark.operators.boxes`.

Reference quirks preserved (documented, NOT fixed):

* ``update_amsgrad`` keeps persistent AMSGrad state for ``mu`` but
  rebuilds zero moment buffers for ``delta`` on every call
  (training.rs:1728-1741 — the locals shadow the state), so delta
  updates degrade to bias-corrected sign-RMS steps with no momentum.
* ``initialize_boxes``'s "shared group center" is re-drawn per entity
  (the option is scoped inside the per-entity loop, training.rs:407-425)
  — coreferent entities get independent centers in the same +/-0.15
  region rather than one true shared center.
* ``split_train_val`` returns ``(first val_size rows, rest)`` — the
  TRAIN side gets ``val_ratio`` of the data (training.rs:1119-1135,
  ``Vec::split_off`` semantics), not the other way around.
* The positive-pair ``gradient_strength`` tiers key off box A's overlap
  ratio only, but scale box B's gradient too (training.rs:1408-1430).
* Entity ids are mention start offsets (training.rs:148-152), so two
  mentions starting at the same offset share one box.

Deterministic deviation: the reference's ``simple_random`` hashes the
wall clock (training.rs:1754-1784) and is irreproducible by design; we
substitute a seeded counter-hash RNG with the same uniform-[0,1) shape
so tests and Spark retries are stable (corpus-determinism rule,
TESTDATA.md).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

import numpy as np

from anno_spark.core import boxes as B

__all__ = [
    "TrainableBox",
    "TrainingConfig",
    "AMSGradState",
    "TrainingExample",
    "BoxEmbeddingTrainer",
    "compute_pair_loss",
    "compute_analytical_gradients",
    "get_learning_rate",
    "split_train_val",
    "DeterministicRandom",
]


class DeterministicRandom:
    """Seeded stand-in for the reference's time-hash RNG.

    Same output shape (uniform f32 in [0,1) from a 64-bit hash,
    training.rs:1754-1784) but driven by a counter + seed, so every run
    is reproducible.
    """

    def __init__(self, seed: int = 0):
        self.seed = seed
        self.counter = 0

    def __call__(self) -> float:
        h = hashlib.blake2b(
            f"{self.seed}:{self.counter}".encode(), digest_size=8
        ).digest()
        self.counter += 1
        return int.from_bytes(h, "little") / 2.0 ** 64


# ---------------------------------------------------------------------------
# trainable parameterization (training.rs:63-120)


@dataclass
class TrainableBox:
    """mu/delta parameterization: width = exp(delta), always min <= max."""

    mu: np.ndarray
    delta: np.ndarray

    def __post_init__(self):
        self.mu = np.asarray(self.mu, dtype=np.float32)
        self.delta = np.asarray(self.delta, dtype=np.float32)
        if self.mu.shape != self.delta.shape:
            raise ValueError("mu and delta must have same dimension")

    @property
    def dim(self) -> int:
        return len(self.mu)

    @classmethod
    def from_vector(cls, vector, init_width: float) -> "TrainableBox":
        """Small box around a point; delta = ln(init_width) (rs:98-103)."""
        mu = np.asarray(vector, dtype=np.float32)
        delta = np.full(len(mu), math.log(init_width), dtype=np.float32)
        return cls(mu, delta)

    def to_box(self):
        """(min, max) bounds for inference (rs:106-120)."""
        half = np.exp(self.delta) / 2.0
        return self.mu - half, self.mu + half


# ---------------------------------------------------------------------------
# config + optimizer state (training.rs:201-296)


@dataclass
class TrainingConfig:
    """Defaults transcribed from training.rs:228-247."""

    learning_rate: float = 0.001
    negative_weight: float = 0.5
    margin: float = 0.3
    regularization: float = 0.0001
    epochs: int = 100
    batch_size: int = 32
    warmup_epochs: int = 10
    use_self_adversarial: bool = True
    adversarial_temperature: float = 1.0
    early_stopping_patience: int | None = 10
    early_stopping_min_delta: float = 0.001
    positive_focus_epochs: int | None = None


@dataclass
class AMSGradState:
    """Per-box optimizer state (training.rs:253-285)."""

    m: np.ndarray
    v: np.ndarray
    v_hat: np.ndarray
    t: int
    lr: float
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8

    @classmethod
    def new(cls, dim: int, learning_rate: float) -> "AMSGradState":
        z = lambda: np.zeros(dim, dtype=np.float32)
        return cls(m=z(), v=z(), v_hat=z(), t=0, lr=learning_rate)


# ---------------------------------------------------------------------------
# training data (training.rs:133-198)
#
# A chain is a list of mention dicts {"start", "end", "text",
# "entity_type"}; an example is one document's chains.  Entity id ==
# mention start offset (reference quirk).


@dataclass
class TrainingExample:
    chains: list

    def entity_ids(self) -> list:
        return [m["start"] for chain in self.chains for m in chain]


def get_learning_rate(epoch: int, total_epochs: int, base_lr: float,
                      warmup_epochs: int) -> float:
    """Linear warmup 0.1*lr -> lr, then cosine decay to 0.1*lr
    (training.rs:1667-1680)."""
    if epoch < warmup_epochs:
        warmup_lr = base_lr * 0.1
        return warmup_lr + (base_lr - warmup_lr) * (epoch / warmup_epochs)
    progress = (epoch - warmup_epochs) / max(total_epochs - warmup_epochs, 1)
    min_lr = base_lr * 0.1
    return min_lr + (base_lr - min_lr) * (1.0 + math.cos(math.pi * progress)) / 2.0


def split_train_val(examples: list, val_ratio: float,
                    rng: DeterministicRandom | None = None) -> tuple:
    """Shuffled split — reference quirk: the FIRST ``val_ratio`` slice is
    returned as the train side (training.rs:1119-1135)."""
    rng = rng or DeterministicRandom(13)
    val_size = int(len(examples) * val_ratio)
    shuffled = list(examples)
    for i in range(len(shuffled) - 1, 0, -1):
        j = int(rng() * (i + 1))
        shuffled[i], shuffled[j] = shuffled[j], shuffled[i]
    return shuffled[:val_size], shuffled[val_size:]


# ---------------------------------------------------------------------------
# loss (training.rs:1140-1270)


def compute_pair_loss(box_a: TrainableBox, box_b: TrainableBox,
                      is_positive: bool, config: TrainingConfig) -> float:
    a_min, a_max = box_a.to_box()
    b_min, b_max = box_b.to_box()
    vol_a = float(B.volume(a_min, a_max))
    vol_b = float(B.volume(b_min, b_max))
    inter = float(B.intersection_volume(a_min, a_max, b_min, b_max))

    if is_positive:
        p_a_b = max(inter / vol_b if vol_b > 0.0 else 0.0, 1e-8)
        p_b_a = max(inter / vol_a if vol_a > 0.0 else 0.0, 1e-8)
        neg_log_prob = -math.log(min(p_a_b, p_b_a))
        if inter < 1e-10:
            dist = float(np.sqrt(np.sum(
                (B.center(a_min, a_max) - B.center(b_min, b_max)) ** 2)))
            distance_penalty = 0.3 * dist
        else:
            overlap_ratio = inter / max(min(vol_a, vol_b), 1e-10)
            distance_penalty = (0.1 * (0.5 - overlap_ratio)
                                if overlap_ratio < 0.5 else 0.0)
        reg = config.regularization * 1.0 * (vol_a + vol_b)
        return max(neg_log_prob + reg + distance_penalty, 0.0)

    # negative pair (training.rs:1193-1270)
    p_a_b = inter / vol_b if vol_b > 0.0 else 0.0
    p_b_a = inter / vol_a if vol_a > 0.0 else 0.0
    max_prob = max(p_a_b, p_b_a)
    if max_prob > config.margin:
        excess = max_prob - config.margin
        margin_loss = excess ** 2 * (1.0 + excess * 2.0)
    else:
        margin_loss = 0.0
    if inter > 1e-10:
        overlap_ratio = inter / max(min(vol_a, vol_b), 1e-10)
        if overlap_ratio > 0.5:
            overlap_penalty = 4.0 * overlap_ratio * overlap_ratio
        elif overlap_ratio > 0.3:
            overlap_penalty = 3.0 * overlap_ratio
        else:
            overlap_penalty = 2.5 * overlap_ratio
    else:
        overlap_penalty = 0.0
    base_loss = max_prob * 0.2 if max_prob > 0.01 else 0.0
    if max_prob > 0.1:
        e = max_prob - 0.1
        adaptive_penalty = e ** 2 * (3.0 + e * 7.0)
    elif max_prob > 0.05:
        adaptive_penalty = (max_prob - 0.05) ** 2 * 1.5
    elif max_prob > 0.02:
        adaptive_penalty = (max_prob - 0.02) ** 2 * 0.5
    else:
        adaptive_penalty = 0.0
    return config.negative_weight * (
        margin_loss + overlap_penalty + base_loss + adaptive_penalty)


# ---------------------------------------------------------------------------
# analytical gradients (training.rs:1273-1632)
#
# The per-dimension tier tables are vectorized with np.select but keep
# the exact reference thresholds and coefficients.


def _tier(x, bounds, values, default):
    """np.select over ascending '< bound' tiers."""
    return np.select([x < b for b in bounds], values, default=default)


def compute_analytical_gradients(box_a: TrainableBox, box_b: TrainableBox,
                                 is_positive: bool, config: TrainingConfig):
    a_min, a_max = box_a.to_box()
    b_min, b_max = box_b.to_box()
    dim = box_a.dim
    vol_a = float(B.volume(a_min, a_max))
    vol_b = float(B.volume(b_min, b_max))
    inter = float(B.intersection_volume(a_min, a_max, b_min, b_max))

    grad_mu_a = np.zeros(dim, np.float32)
    grad_delta_a = np.zeros(dim, np.float32)
    grad_mu_b = np.zeros(dim, np.float32)
    grad_delta_b = np.zeros(dim, np.float32)

    lo = np.maximum(a_min, b_min)
    hi = np.minimum(a_max, b_max)
    overlap_i = np.maximum(hi - lo, 0.0)
    # strict per-dim overlap test as in the reference (min < max both ways)
    overlaps = (a_min < b_max) & (b_min < a_max)
    overlap_i = np.where(overlaps, overlap_i, 0.0)

    center_a = B.center(a_min, a_max)
    center_b = B.center(b_min, b_max)

    if is_positive:
        p_a_b = max(inter / vol_b if vol_b > 0.0 else 0.0, 1e-8)
        p_b_a = max(inter / vol_a if vol_a > 0.0 else 0.0, 1e-8)
        has_overlap = inter > 1e-10

        if not has_overlap:
            # strong center attraction + growth (training.rs:1344-1370)
            diff = center_b - center_a
            center_dist = float(np.sqrt(np.sum(diff ** 2)))
            distance_factor = min(max(center_dist / dim, 0.5), 2.0)
            attraction = 4.0 * distance_factor
            grad_mu_a += attraction * diff
            grad_mu_b += -attraction * diff
            grad_delta_a += 0.5 * distance_factor
            grad_delta_b += 0.5 * distance_factor

        dim_ok = overlaps & (overlap_i > 0.0) & (inter > 0.0)
        if inter > 0.0:
            ratio_a = inter / max(vol_a, 1e-10)
            ratio_b = inter / max(vol_b, 1e-10)
            # growth tiers (training.rs:1390-1434)
            growth_a = float(_tier(ratio_a, [0.15, 0.3, 0.5, 0.7, 0.85],
                                   [0.35, 0.3, 0.2, 0.1, 0.05], 0.0))
            growth_b = float(_tier(ratio_b, [0.15, 0.3, 0.5, 0.7, 0.85],
                                   [0.35, 0.3, 0.2, 0.1, 0.05], 0.0))
            # strength keyed off ratio_a ONLY — reference quirk (rs:1438-1448)
            gs = float(_tier(ratio_a, [0.1, 0.2, 0.4, 0.6],
                             [1.7, 1.6, 1.4, 1.1], 0.6))
            g_inter = inter * 0.5 * gs
            main_a = -(g_inter / max(vol_b, 1e-8)) / max(p_a_b, 1e-8) * gs
            main_b = -(g_inter / max(vol_a, 1e-8)) / max(p_b_a, 1e-8) * gs
            grad_delta_a += np.where(dim_ok, growth_a + main_a, 0.0)
            grad_delta_b += np.where(dim_ok, growth_b + main_b, 0.0)
        # dims without overlap grow hard (rs:1459-1462)
        grad_delta_a += np.where(~dim_ok, 0.3, 0.0)
        grad_delta_b += np.where(~dim_ok, 0.3, 0.0)
        # regularization on every dim (rs:1465-1468)
        grad_delta_a += config.regularization * 1.0 * vol_a
        grad_delta_b += config.regularization * 1.0 * vol_b
    else:
        nw = config.negative_weight
        p_a_b = inter / vol_b if vol_b > 0.0 else 0.0
        p_b_a = inter / vol_a if vol_a > 0.0 else 0.0
        max_prob = max(p_a_b, p_b_a)
        width_a = np.maximum(a_max - a_min, 1e-6)

        has_dim = overlap_i > 0.0
        diff = center_b - center_a
        overlap_factor = np.minimum(overlap_i / width_a, 1.0)
        separation = 1.5 + overlap_factor * 2.0
        push = np.where(np.abs(diff) > 1e-6, separation * diff,
                        separation * 2.5)
        grad_mu_a += np.where(has_dim, -nw * push, 0.0)
        grad_mu_b += np.where(has_dim, nw * push, 0.0)
        # shrink tiers on per-dim overlap ratio (rs:1492-1505)
        ratio_dim = overlap_i / width_a
        shrink = np.select(
            [ratio_dim > 0.7, ratio_dim > 0.5, ratio_dim > 0.3],
            [0.7, 0.6, 0.5], default=0.35)
        grad_delta_a += np.where(has_dim, -nw * shrink, 0.0)
        grad_delta_b += np.where(has_dim, -nw * shrink, 0.0)

        if inter > 1e-10:
            pair_ok = has_dim
            min_vol = min(vol_a, vol_b)
            r = inter / max(min_vol, 1e-10)
            if r > 0.5:
                ps, mult = 0.4 + r * 0.6, 4.0
            elif r > 0.3:
                ps, mult = 0.3 + r * 0.5, 3.0
            else:
                ps, mult = 0.2 + r * 0.4, 2.5
            grad_delta_a += np.where(pair_ok, nw * mult * r * ps, 0.0)
            grad_delta_b += np.where(pair_ok, nw * mult * r * ps, 0.0)

            if p_a_b >= p_b_a:
                g = (inter * 0.4) / max(vol_b, 1e-8)
                extra = nw * 0.2 * g
                if max_prob > config.margin:
                    e = max_prob - config.margin
                    extra += nw * (2.0 * e * (1.0 + e * 2.0) * g
                                   + 2.0 * e ** 2 * 2.0 * g)
                if max_prob > 0.1:
                    e = max_prob - 0.1
                    extra += nw * (2.0 * e * g * (3.0 + e * 7.0))
                elif max_prob > 0.05:
                    extra += nw * (2.0 * (max_prob - 0.05) * g * 1.5)
                elif max_prob > 0.02:
                    extra += nw * (2.0 * (max_prob - 0.02) * g * 0.5)
                grad_delta_a += np.where(pair_ok, extra, 0.0)
            else:
                g = (inter * 0.4) / max(vol_a, 1e-8)
                extra = nw * 0.25 * g
                if max_prob > config.margin:
                    e = max_prob - config.margin
                    extra += nw * (2.0 * e * (1.0 + e * 2.0) * g
                                   + 2.0 * e ** 2 * 2.0 * g)
                # asymmetric tiers for the B side — no 0.02 tier (rs:1597-1612)
                if max_prob > 0.1:
                    e = max_prob - 0.1
                    extra += nw * (2.0 * e * g * (2.0 + e * 5.0))
                elif max_prob > 0.05:
                    extra += nw * (2.0 * (max_prob - 0.05) * g * 1.0)
                grad_delta_b += np.where(pair_ok, extra, 0.0)

    clip = lambda a: np.clip(a, -10.0, 10.0).astype(np.float32)
    return clip(grad_mu_a), clip(grad_delta_a), clip(grad_mu_b), clip(grad_delta_b)


# ---------------------------------------------------------------------------
# self-adversarial negative sampling (training.rs:1636-1664)


def sample_self_adversarial_negatives(negative_pairs: list, get_box,
                                      num_samples: int,
                                      temperature: float) -> list:
    """Top-k hardest negatives by current coreference score / T."""
    scores = []
    for idx, (id_a, id_b) in enumerate(negative_pairs):
        box_a, box_b = get_box(id_a), get_box(id_b)
        if box_a is None or box_b is None:
            continue
        a_min, a_max = box_a.to_box()
        b_min, b_max = box_b.to_box()
        s = float(B.coreference_score(a_min, a_max, b_min, b_max))
        scores.append((idx, s / temperature))
    scores.sort(key=lambda t: -t[1])
    return [idx for idx, _ in scores[:num_samples]]


# ---------------------------------------------------------------------------
# AMSGrad step (training.rs:1686-1748) — delta-moment quirk preserved


def update_amsgrad(box: TrainableBox, grad_mu: np.ndarray,
                   grad_delta: np.ndarray, state: AMSGradState) -> None:
    state.t += 1
    t = float(state.t)
    b1, b2 = state.beta1, state.beta2

    state.m = b1 * state.m + (1.0 - b1) * grad_mu
    v_new = b2 * state.v + (1.0 - b2) * grad_mu * grad_mu
    state.v = v_new
    state.v_hat = np.maximum(state.v_hat, v_new)
    m_hat = state.m / (1.0 - b1 ** t)
    box.mu = box.mu - state.lr * m_hat / (np.sqrt(state.v_hat) + state.epsilon)
    box.mu = np.where(np.isfinite(box.mu), box.mu, 0.0).astype(np.float32)

    # QUIRK (training.rs:1728-1741): fresh zero buffers every call, so no
    # momentum accumulates for delta — transcribed, not fixed.
    m_delta = (1.0 - b1) * grad_delta
    v_delta = (1.0 - b2) * grad_delta * grad_delta
    v_hat_delta = np.maximum(np.zeros_like(v_delta), v_delta)
    m_hat_delta = m_delta / (1.0 - b1 ** t)
    box.delta = box.delta - state.lr * m_hat_delta / (
        np.sqrt(v_hat_delta) + state.epsilon)
    box.delta = np.clip(box.delta, math.log(0.01), math.log(10.0))
    box.delta = np.where(np.isfinite(box.delta), box.delta,
                         math.log(0.5)).astype(np.float32)


# ---------------------------------------------------------------------------
# trainer (training.rs:298-1116)


class BoxEmbeddingTrainer:
    """Entity-id -> TrainableBox training loop with adaptive staging."""

    def __init__(self, config: TrainingConfig, dim: int,
                 initial_embeddings: dict | None = None, seed: int = 42):
        self.config = config
        self.dim = dim
        self.boxes: dict = {}
        self.optimizer_states: dict = {}
        self.rng = DeterministicRandom(seed)
        if initial_embeddings:
            for entity_id, vector in initial_embeddings.items():
                assert len(vector) == dim
                self.boxes[entity_id] = TrainableBox.from_vector(vector, 0.1)
                self.optimizer_states[entity_id] = AMSGradState.new(
                    dim, config.learning_rate)

    # -- initialization (training.rs:357-459) --

    def initialize_boxes(self, examples: list,
                         initial_embeddings: dict | None = None) -> None:
        entity_ids = []
        seen = set()
        coref_groups = []
        for example in examples:
            for chain in example.chains:
                group = [m["start"] for m in chain]
                if len(group) > 1:
                    coref_groups.append(set(group))
                for m in chain:
                    if m["start"] not in seen:
                        seen.add(m["start"])
                        entity_ids.append(m["start"])

        for entity_id in entity_ids:
            if initial_embeddings and entity_id in initial_embeddings:
                vector = np.asarray(initial_embeddings[entity_id], np.float32)
                norm = float(np.sqrt(np.sum(vector ** 2)))
                normalized = vector / norm if norm > 0.0 else vector
                self.boxes[entity_id] = TrainableBox.from_vector(normalized, 0.2)
                self.optimizer_states[entity_id] = AMSGradState.new(
                    self.dim, self.config.learning_rate)
                continue
            in_group = any(entity_id in g for g in coref_groups)
            if in_group:
                # QUIRK: the "shared" center is re-drawn per entity
                # (training.rs:407-425) — entities of one group merely
                # land in the same small +/-0.15 region.
                center = np.array([(self.rng() - 0.5) * 0.3
                                   for _ in range(self.dim)], np.float32)
                mu = center + np.array([(self.rng() - 0.5) * 0.05
                                        for _ in range(self.dim)], np.float32)
                initial_width = 1.1
            else:
                mu = np.array([(self.rng() - 0.5) * 1.0
                               for _ in range(self.dim)], np.float32)
                initial_width = 0.18
            delta = np.full(self.dim, math.log(initial_width), np.float32)
            self.boxes[entity_id] = TrainableBox(mu, delta)
            self.optimizer_states[entity_id] = AMSGradState.new(
                self.dim, self.config.learning_rate)

    # -- pair construction (training.rs:475-506) --

    @staticmethod
    def _positive_pairs(example: TrainingExample) -> list:
        pairs = []
        for chain in example.chains:
            ids = [m["start"] for m in chain]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.append((ids[i], ids[j]))
        return pairs

    @staticmethod
    def _negative_pairs(example: TrainingExample) -> list:
        pairs = []
        chains = [[m["start"] for m in c] for c in example.chains]
        for i in range(len(chains)):
            for j in range(i + 1, len(chains)):
                for id_i in chains[i]:
                    for id_j in chains[j]:
                        pairs.append((id_i, id_j))
        return pairs

    # -- one example (training.rs:462-627) --

    def train_example(self, example: TrainingExample, epoch: int) -> float:
        total_loss = 0.0
        num_pairs = 0
        current_lr = get_learning_rate(epoch, self.config.epochs,
                                       self.config.learning_rate,
                                       self.config.warmup_epochs)
        for state in self.optimizer_states.values():
            state.lr = current_lr

        positive_pairs = self._positive_pairs(example)
        negative_pairs = self._negative_pairs(example)

        gradients: dict = {}

        def accumulate(pairs, is_positive):
            nonlocal total_loss, num_pairs
            for id_a, id_b in pairs:
                box_a = self.boxes.get(id_a)
                box_b = self.boxes.get(id_b)
                if box_a is None or box_b is None:
                    continue
                total_loss += compute_pair_loss(box_a, box_b, is_positive,
                                                self.config)
                num_pairs += 1
                gma, gda, gmb, gdb = compute_analytical_gradients(
                    box_a, box_b, is_positive, self.config)
                if not (np.isfinite(gma).all() and np.isfinite(gda).all()
                        and np.isfinite(gmb).all() and np.isfinite(gdb).all()):
                    continue
                ea = gradients.setdefault(
                    id_a, (np.zeros(self.dim, np.float32),
                           np.zeros(self.dim, np.float32)))
                ea[0][:] += gma
                ea[1][:] += gda
                eb = gradients.setdefault(
                    id_b, (np.zeros(self.dim, np.float32),
                           np.zeros(self.dim, np.float32)))
                eb[0][:] += gmb
                eb[1][:] += gdb

        accumulate(positive_pairs, True)

        num_samples = min(len(positive_pairs), len(negative_pairs))
        if self.config.use_self_adversarial and negative_pairs:
            idxs = sample_self_adversarial_negatives(
                negative_pairs, self.boxes.get, num_samples,
                self.config.adversarial_temperature)
            negative_samples = [negative_pairs[i] for i in idxs]
        else:
            negative_samples = negative_pairs[:num_samples]
        accumulate(negative_samples, False)

        for entity_id, (grad_mu, grad_delta) in gradients.items():
            box = self.boxes.get(entity_id)
            state = self.optimizer_states.get(entity_id)
            if box is not None and state is not None:
                update_amsgrad(box, grad_mu, grad_delta, state)

        return total_loss / num_pairs if num_pairs else 0.0

    # -- adaptive negative-weight schedule (training.rs:629-795) --

    def _adaptive_negative_weight(self, epoch: int, avg_pos: float,
                                  avg_neg: float) -> float:
        cfg = self.config
        gap = avg_pos - avg_neg
        pfe = (cfg.positive_focus_epochs
               if cfg.positive_focus_epochs is not None else cfg.epochs // 3)
        if epoch < pfe:
            stage_progress = epoch / pfe if pfe else 0.0
            return cfg.negative_weight * (0.2 + stage_progress * 0.1)
        progress = min((epoch - pfe) / max(cfg.epochs - pfe, 1), 1.0)
        if avg_pos > 0.05 and avg_neg > 0.3:
            neg_penalty = min(avg_neg / 0.4, 1.0)
            return cfg.negative_weight * min(
                0.7 + progress * 0.8 + neg_penalty * 0.4, 2.0)
        if avg_pos > 0.02 and gap > 0.0:
            return cfg.negative_weight * min(
                0.5 + progress * 0.5, 1.0 + gap / 0.1)
        if avg_pos < 0.01:
            return cfg.negative_weight * 0.3
        return cfg.negative_weight * (0.4 + progress * 0.4)

    def train(self, examples: list, log=None) -> list:
        """Epoch loop with staging, early stopping; returns loss history."""
        cfg = self.config
        losses: list = []
        best_loss = float("inf")
        patience_counter = 0

        for epoch in range(cfg.epochs):
            avg_pos, avg_neg, _ = self.get_overlap_stats(examples)
            adaptive_nw = self._adaptive_negative_weight(epoch, avg_pos, avg_neg)
            original_nw = cfg.negative_weight
            cfg.negative_weight = adaptive_nw

            order = list(range(len(examples)))
            for i in range(len(order) - 1, 0, -1):
                j = int(self.rng() * (i + 1))
                order[i], order[j] = order[j], order[i]

            epoch_loss = 0.0
            num_batches = 0
            for batch_start in range(0, len(examples), cfg.batch_size):
                batch = order[batch_start:batch_start + cfg.batch_size]
                batch_loss = sum(
                    self.train_example(examples[idx], epoch) for idx in batch)
                if batch:
                    epoch_loss += batch_loss / len(batch)
                    num_batches += 1
            avg_loss = epoch_loss / num_batches if num_batches else 0.0
            losses.append(avg_loss)

            improved = avg_loss < best_loss - cfg.early_stopping_min_delta
            if improved:
                best_loss = avg_loss
                patience_counter = 0
            else:
                patience_counter += 1
            if log and (epoch % 10 == 0 or epoch == cfg.epochs - 1 or improved):
                log(f"epoch {epoch}: loss={avg_loss:.4f} best={best_loss:.4f} "
                    f"neg_w={adaptive_nw:.2f}")

            cfg.negative_weight = original_nw
            if (cfg.early_stopping_patience is not None
                    and patience_counter >= cfg.early_stopping_patience):
                break
        return losses

    # -- diagnostics + evaluation (training.rs:798-997) --

    def get_boxes(self) -> dict:
        return {k: v.to_box() for k, v in self.boxes.items()}

    def _pair_scores(self, pairs):
        for id_a, id_b in pairs:
            box_a = self.boxes.get(id_a)
            box_b = self.boxes.get(id_b)
            if box_a is None or box_b is None:
                yield None
                continue
            a_min, a_max = box_a.to_box()
            b_min, b_max = box_b.to_box()
            yield float(B.coreference_score(a_min, a_max, b_min, b_max))

    def get_overlap_stats(self, examples: list) -> tuple:
        """(avg_positive_score, avg_negative_score, overlap_rate)."""
        pos, neg = [], []
        overlapping = 0
        total = 0
        for example in examples:
            for s in self._pair_scores(self._positive_pairs(example)):
                if s is None:
                    continue
                pos.append(s)
                total += 1
                if s > 0.01:
                    overlapping += 1
            for s in self._pair_scores(self._negative_pairs(example)):
                if s is not None:
                    neg.append(s)
        return (
            sum(pos) / len(pos) if pos else 0.0,
            sum(neg) / len(neg) if neg else 0.0,
            overlapping / total if total else 0.0,
        )

    def evaluate(self, examples: list, threshold: float) -> tuple:
        """Pairwise (accuracy, precision, recall, f1) (training.rs:890-997).

        Accounting transcribed: positives with a missing box count as
        false negatives, negatives with a missing box count as correct.
        """
        tp = fp = fn = total = 0
        for example in examples:
            for s in self._pair_scores(self._positive_pairs(example)):
                total += 1
                if s is None or s < threshold:
                    fn += 1
                else:
                    tp += 1
            for s in self._pair_scores(self._negative_pairs(example)):
                total += 1
                if s is not None and s >= threshold:
                    fp += 1
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall else 0.0)
        accuracy = (tp + (total - tp - fp - fn)) / total if total else 0.0
        return accuracy, precision, recall, f1

    def evaluate_standard_metrics(self, examples: list,
                                  threshold: float) -> dict:
        """MUC/B3/CEAF/LEA/BLANC via the box resolver + ported metrics
        (training.rs:1060-1106)."""
        from anno_spark.eval import coref_metrics

        all_pred, all_gold = [], []
        for ex_idx, example in enumerate(examples):
            entities = [(m["text"], m.get("entity_type", "PER"),
                         m["start"], m["end"])
                        for chain in example.chains for m in chain]
            mins, maxs = [], []
            for (_, _, start, _) in entities:
                box = self.boxes.get(start)
                if box is not None:
                    mn, mx = box.to_box()
                else:
                    mn, mx = B.box_from_vector(np.zeros(self.dim, np.float32), 0.1)
                mins.append(mn)
                maxs.append(mx)
            cfg = B.BoxCorefConfig(coreference_threshold=threshold)
            cluster_ids = B.resolve_with_boxes(entities, np.array(mins),
                                               np.array(maxs), cfg)
            by_cluster: dict = {}
            for (text, _etype, start, end), cid in zip(entities, cluster_ids):
                # example-namespaced mention ids: identical spans in two
                # examples must not collide in the pooled metric input
                by_cluster.setdefault(cid, []).append((ex_idx, start, end))
            all_pred.extend(by_cluster.values())
            all_gold.extend(
                [[(ex_idx, m["start"], m["end"]) for m in chain]
                 for chain in example.chains])
        return {
            "muc": coref_metrics.muc_score(all_pred, all_gold).as_tuple(),
            "b_cubed": coref_metrics.b_cubed_score(all_pred, all_gold).as_tuple(),
            "ceaf_e": coref_metrics.ceaf_e_score(all_pred, all_gold).as_tuple(),
            "lea": coref_metrics.lea_score(all_pred, all_gold).as_tuple(),
            "blanc": coref_metrics.blanc_score(all_pred, all_gold).as_tuple(),
        }

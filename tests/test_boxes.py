"""Box embeddings: geometry parity with the reference's unit tests,
trainer behavior, and Spark<->numpy differentials.

Geometry cases are transcribed from the reference test module
(anno/src/backends/box_embeddings.rs:707-965); trainer checks pin the
port's behavior on a small deterministic corpus; the Spark tests prove
the blocked pair generation is lossless against a brute-force numpy
all-pairs oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from anno_spark.core import boxes as B
from anno_spark.core import box_training as T


# ---------------------------------------------------------------------------
# geometry (reference tests, box_embeddings.rs:710-800)


def test_box_volume():
    assert B.volume([0.0, 0.0], [1.0, 1.0]) == 1.0
    assert B.volume([0.0, 0.0, 0.0], [2.0, 3.0, 4.0]) == 24.0


def test_intersection_volume():
    assert B.intersection_volume([0, 0], [2, 2], [1, 1], [3, 3]) == 1.0
    assert B.intersection_volume([0, 0], [2, 2], [5, 5], [6, 6]) == 0.0


def test_conditional_probability():
    # box_a ⊆ box_b: P(A|B)=1/4, P(B|A)=1
    assert B.conditional_probability([0, 0], [1, 1], [0, 0], [2, 2]) == 0.25
    assert B.conditional_probability([0, 0], [2, 2], [0, 0], [1, 1]) == 1.0


def test_zero_volume_conditioning_box_quirk():
    # reference returns 0.0 when Vol(other) == 0, even for identical points
    assert B.conditional_probability([1, 1], [1, 1], [1, 1], [1, 1]) == 0.0


def test_coreference_score():
    assert abs(B.coreference_score([0, 0], [1, 1], [0, 0], [1, 1]) - 1.0) < 1e-6
    assert B.coreference_score([0, 0], [1, 1], [2, 2], [3, 3]) == 0.0


def test_containment_and_disjoint():
    assert B.is_contained_in([0, 0], [1, 1], [0, 0], [2, 2])
    assert not B.is_contained_in([0, 0], [2, 2], [0, 0], [1, 1])
    assert B.is_disjoint([0, 0], [1, 1], [2, 2], [3, 3])
    assert not B.is_disjoint([0, 0], [1, 1], [0.5, 0.5], [1.5, 1.5])


def test_from_vector():
    mn, mx = B.box_from_vector([0.5, 0.5, 0.5], 0.1)
    assert np.allclose(mn, [0.4, 0.4, 0.4])
    assert np.allclose(mx, [0.6, 0.6, 0.6])
    assert abs(float(B.volume(mn, mx)) - 0.008) < 1e-6


def test_center_and_size():
    assert np.allclose(B.center([0.0, 1.0], [2.0, 3.0]), [1.0, 2.0])
    assert np.allclose(B.size([0.0, 1.0], [2.0, 3.0]), [2.0, 2.0])


def test_batched_geometry_matches_scalar():
    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, (20, 4)).astype(np.float32)
    aw = rng.uniform(0.01, 1, (20, 4)).astype(np.float32)
    b = rng.uniform(-1, 1, (20, 4)).astype(np.float32)
    bw = rng.uniform(0.01, 1, (20, 4)).astype(np.float32)
    batched = B.coreference_score(a, a + aw, b, b + bw)
    for i in range(20):
        assert batched[i] == pytest.approx(
            float(B.coreference_score(a[i], a[i] + aw[i], b[i], b[i] + bw[i])))


# ---------------------------------------------------------------------------
# temporal boxes (rs:805-850)


def test_temporal_box_at_time():
    tb = B.TemporalBox.static([0.0, 0.0], [1.0, 1.0], (2012.0, 2016.0))
    assert tb.is_valid_at(2014.0)
    assert not tb.is_valid_at(2017.0)
    mn, mx = tb.at_time(2014.0)
    assert np.allclose(mn, [0, 0]) and np.allclose(mx, [1, 1])


def test_temporal_box_with_velocity():
    tb = B.TemporalBox([0.0, 0.0], [1.0, 1.0], [0.1, 0.1], [0.1, 0.1],
                       0.0, 10.0)
    mn, mx = tb.at_time(5.0)
    assert np.allclose(mn, [0.5, 0.5])
    assert np.allclose(mx, [1.5, 1.5])


def test_temporal_box_coreference_across_ranges():
    obama = B.TemporalBox.static([0.0, 0.0], [1.0, 1.0], (2012.0, 2016.0))
    trump = B.TemporalBox.static([5.0, 5.0], [6.0, 6.0], (2017.0, 2021.0))
    assert obama.coreference_at_time(trump, 2015.0) == 0.0
    assert obama.coreference_at_time(trump, 2018.0) == 0.0


# ---------------------------------------------------------------------------
# uncertain boxes + conflicts (rs:855-895)


def test_uncertain_box_confidence():
    small = B.UncertainBox([0.0, 0.0], [0.1, 0.1], 0.9)
    large = B.UncertainBox([0.0, 0.0], [10.0, 10.0], 0.9)
    assert small.confidence() > 0.5
    assert large.confidence() < small.confidence()


def test_conflict_detection():
    a = B.UncertainBox([0.0, 0.0], [0.1, 0.1], 0.95)
    b = B.UncertainBox([5.0, 5.0], [5.1, 5.1], 0.90)
    c = a.detect_conflict(b)
    assert c is not None
    assert c.severity > 0.0
    assert c.claim_a_trust == pytest.approx(0.95)
    assert c.claim_b_trust == pytest.approx(0.90)


def test_no_conflict_for_overlapping_boxes():
    a = B.UncertainBox([0.0, 0.0], [1.0, 1.0], 0.95)
    b = B.UncertainBox([0.5, 0.5], [1.5, 1.5], 0.90)
    assert a.detect_conflict(b) is None


# ---------------------------------------------------------------------------
# Gumbel boxes (rs:900-940)


def test_gumbel_membership():
    g = B.GumbelBox([0.0, 0.0], [1.0, 1.0], 0.1)
    assert g.membership_probability([0.5, 0.5]) > 0.5
    assert g.membership_probability([2.0, 2.0]) < g.membership_probability([0.5, 0.5])


def test_gumbel_temperature_effect():
    sharp = B.GumbelBox([0.0, 0.0], [1.0, 1.0], 0.01)
    fuzzy = B.GumbelBox([0.0, 0.0], [1.0, 1.0], 1.0)
    point = [1.1, 1.1]
    assert fuzzy.membership_probability(point) > sharp.membership_probability(point)


def test_gumbel_robust_coreference():
    g1 = B.GumbelBox([0.0, 0.0], [1.0, 1.0], 0.1)
    g2 = B.GumbelBox([0.1, 0.1], [0.9, 0.9], 0.1)
    assert g1.robust_coreference(g2, 100) > 0.3


# ---------------------------------------------------------------------------
# interaction modeling (rs:945-965)


def test_interaction_strength():
    actor = ([0.0, 0.0], [1.0, 1.0])
    action = ([0.2, 0.2], [0.8, 0.8])
    target = ([0.3, 0.3], [0.7, 0.7])
    s = B.interaction_strength(actor, action, target)
    assert 0.0 < s <= 1.0


def test_acquisition_roles():
    buyer = ([0.0, 0.0], [1.0, 1.0])
    seller = ([0.5, 0.5], [1.5, 1.5])
    acq = ([0.2, 0.2], [0.8, 0.8])
    br, sr = B.acquisition_roles(buyer, seller, acq)
    assert br >= 0.0 and sr >= 0.0


# ---------------------------------------------------------------------------
# box coref resolver (coref_resolver.rs:1096-1240)


def test_resolve_with_boxes_clusters_overlapping():
    entities = [("John", "PER", 0, 4), ("he", "PER", 100, 102),
                ("Acme", "ORG", 200, 204)]
    mins = np.array([[0.0, 0.0], [0.1, 0.1], [5.0, 5.0]], np.float32)
    maxs = np.array([[1.0, 1.0], [0.9, 0.9], [6.0, 6.0]], np.float32)
    ids = B.resolve_with_boxes(entities, mins, maxs)
    assert ids[0] == ids[1]
    assert ids[2] != ids[0]


def test_resolver_type_gate():
    # identical boxes, different entity types -> never linked
    entities = [("John", "PER", 0, 4), ("Acme", "ORG", 100, 104)]
    mins = np.array([[0.0, 0.0], [0.0, 0.0]], np.float32)
    maxs = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)
    ids = B.resolve_with_boxes(entities, mins, maxs)
    assert ids[0] != ids[1]


def test_resolver_principle_b_distance_quirk():
    # pronoun at distance <= max_local_distance needs distance > 50 —
    # impossible, so a pronoun adjacent to its antecedent never links
    # (coref_resolver.rs:1203-1208 heuristic transcribed)
    entities = [("he", "PER", 10, 12), ("John", "PER", 14, 18)]
    mins = np.array([[0.0, 0.0], [0.0, 0.0]], np.float32)
    maxs = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)
    assert B.resolve_with_boxes(entities, mins, maxs)[0] != 1
    ids = B.resolve_with_boxes(entities, mins, maxs)
    assert ids[0] != ids[1]
    # with constraints off, the same pair links
    cfg = B.BoxCorefConfig(enforce_syntactic_constraints=False)
    ids2 = B.resolve_with_boxes(entities, mins, maxs, cfg)
    assert ids2[0] == ids2[1]


# ---------------------------------------------------------------------------
# training


def _toy_examples():
    """Two documents, two chains each; chain mentions share prefixes."""
    def chain(start0, n, step=40):
        return [{"start": start0 + i * step, "end": start0 + i * step + 5,
                 "text": f"m{start0}_{i}", "entity_type": "PER"}
                for i in range(n)]

    return [
        T.TrainingExample(chains=[chain(0, 3), chain(1000, 3)]),
        T.TrainingExample(chains=[chain(2000, 2), chain(3000, 3)]),
    ]


def test_trainable_box_roundtrip():
    tb = T.TrainableBox.from_vector([0.5, -0.5], 0.2)
    mn, mx = tb.to_box()
    assert np.allclose(mn, [0.4, -0.6])
    assert np.allclose(mx, [0.6, -0.4])


def test_learning_rate_schedule():
    # warmup: 0.1*lr -> lr over warmup_epochs, then cosine to 0.1*lr
    assert T.get_learning_rate(0, 100, 1.0, 10) == pytest.approx(0.1)
    assert T.get_learning_rate(10, 100, 1.0, 10) == pytest.approx(1.0)
    assert T.get_learning_rate(99, 100, 1.0, 10) == pytest.approx(0.1, abs=0.01)


def test_split_train_val_quirk():
    # reference quirk: TRAIN side gets val_ratio of the data
    examples = list(range(10))
    train, val = T.split_train_val(examples, 0.2)
    assert len(train) == 2
    assert len(val) == 8
    assert sorted(train + val) == examples


def test_positive_loss_decreases_with_overlap():
    cfg = T.TrainingConfig()
    far = T.TrainableBox(np.array([5.0, 5.0]), np.array([0.0, 0.0]))
    near = T.TrainableBox(np.array([0.1, 0.1]), np.array([0.0, 0.0]))
    anchor = T.TrainableBox(np.array([0.0, 0.0]), np.array([0.0, 0.0]))
    assert T.compute_pair_loss(anchor, near, True, cfg) < \
        T.compute_pair_loss(anchor, far, True, cfg)


def test_negative_loss_increases_with_overlap():
    cfg = T.TrainingConfig()
    far = T.TrainableBox(np.array([5.0, 5.0]), np.array([0.0, 0.0]))
    same = T.TrainableBox(np.array([0.0, 0.0]), np.array([0.0, 0.0]))
    anchor = T.TrainableBox(np.array([0.0, 0.0]), np.array([0.0, 0.0]))
    assert T.compute_pair_loss(anchor, far, False, cfg) == 0.0
    assert T.compute_pair_loss(anchor, same, False, cfg) > 0.0


def test_gradients_finite_and_clipped():
    cfg = T.TrainingConfig()
    rng = np.random.default_rng(3)
    for _ in range(50):
        a = T.TrainableBox(rng.normal(0, 2, 3), rng.uniform(-2, 1, 3))
        b = T.TrainableBox(rng.normal(0, 2, 3), rng.uniform(-2, 1, 3))
        for pos in (True, False):
            grads = T.compute_analytical_gradients(a, b, pos, cfg)
            for g in grads:
                assert np.isfinite(g).all()
                assert (np.abs(g) <= 10.0).all()


def test_amsgrad_delta_quirk_no_momentum():
    # delta moments are rebuilt from zero each call (training.rs:
    # 1728-1741) — the step is a pure function of (grad, t, lr):
    # lr * [(1-b1)g/(1-b1^t)] / (sqrt((1-b2)g^2) + eps), with no
    # history from earlier calls.
    box = T.TrainableBox(np.zeros(2), np.zeros(2))
    state = T.AMSGradState.new(2, 0.01)
    g_mu = np.array([1.0, 1.0], np.float32)
    g_delta = np.array([1.0, 1.0], np.float32)
    for expected_t in (1, 2, 3):
        d_before = box.delta.copy()
        T.update_amsgrad(box, g_mu, g_delta, state)
        step = d_before - box.delta
        b1, b2 = state.beta1, state.beta2
        m_hat = (1 - b1) * 1.0 / (1 - b1 ** expected_t)
        closed_form = 0.01 * m_hat / (math.sqrt((1 - b2) * 1.0) + state.epsilon)
        assert np.allclose(step, closed_form, atol=1e-5), expected_t


def test_training_improves_separation():
    # random init drops every box into the same +/-0.15 region
    # (initialize_boxes quirk) — assert the gap moves the right way;
    # the reference's own example program makes no stronger promise
    # (examples/box_training.rs:191 tolerates unresolved coref).
    cfg = T.TrainingConfig(epochs=30, warmup_epochs=3,
                           early_stopping_patience=None)
    trainer = T.BoxEmbeddingTrainer(cfg, dim=2, seed=11)
    examples = _toy_examples()
    trainer.initialize_boxes(examples)
    pos0, neg0, _ = trainer.get_overlap_stats(examples)
    losses = trainer.train(examples)
    pos1, neg1, _ = trainer.get_overlap_stats(examples)
    assert len(losses) == 30
    # training must widen the positive-negative score gap
    assert (pos1 - neg1) > (pos0 - neg0)
    # positives all overlap -> pairwise recall is total
    acc, p, r, f1 = trainer.evaluate(examples, threshold=0.3)
    assert r == pytest.approx(1.0)


def test_training_from_vector_init_separates_well():
    # the intended usage: boxes seeded from encoder vectors
    # (initialize_boxes' embedding path, training.rs:442-459); coreferent
    # mentions get nearby vectors, cross-chain mentions distant ones.
    cfg = T.TrainingConfig(epochs=20, warmup_epochs=2,
                           early_stopping_patience=None)
    examples = _toy_examples()
    rng = np.random.default_rng(0)
    embeddings = {}
    anchor = {}
    for ex in examples:
        for ci, chain in enumerate(ex.chains):
            base = anchor.setdefault(
                (id(ex), ci), rng.normal(0, 1, 4).astype(np.float32) * 3.0)
            for m in chain:
                embeddings[m["start"]] = base + rng.normal(0, 0.02, 4).astype(
                    np.float32)
    trainer = T.BoxEmbeddingTrainer(cfg, dim=4, seed=11)
    trainer.initialize_boxes(examples, embeddings)
    trainer.train(examples)
    pos, neg, _ = trainer.get_overlap_stats(examples)
    assert pos - neg > 0.3
    acc, p, r, f1 = trainer.evaluate(examples, threshold=0.3)
    assert f1 > 0.8


def test_training_deterministic():
    cfg = T.TrainingConfig(epochs=5, early_stopping_patience=None)
    runs = []
    for _ in range(2):
        tr = T.BoxEmbeddingTrainer(cfg, dim=2, seed=11)
        tr.initialize_boxes(_toy_examples())
        losses = tr.train(_toy_examples())
        runs.append((losses, {k: (v.mu.copy(), v.delta.copy())
                              for k, v in tr.boxes.items()}))
    assert runs[0][0] == runs[1][0]
    for k in runs[0][1]:
        assert np.allclose(runs[0][1][k][0], runs[1][1][k][0])
        assert np.allclose(runs[0][1][k][1], runs[1][1][k][1])


def test_evaluate_standard_metrics_shape():
    cfg = T.TrainingConfig(epochs=10, early_stopping_patience=None)
    trainer = T.BoxEmbeddingTrainer(cfg, dim=2, seed=5)
    examples = _toy_examples()
    trainer.initialize_boxes(examples)
    trainer.train(examples)
    m = trainer.evaluate_standard_metrics(examples, threshold=0.3)
    assert set(m) == {"muc", "b_cubed", "ceaf_e", "lea", "blanc"}
    for prf in m.values():
        assert len(prf) == 3
        assert all(0.0 <= x <= 1.0 for x in prf)


def test_self_adversarial_picks_hardest():
    boxes = {
        0: T.TrainableBox(np.zeros(2), np.zeros(2)),
        1: T.TrainableBox(np.array([0.05, 0.05]), np.zeros(2)),  # near 0
        2: T.TrainableBox(np.array([9.0, 9.0]), np.zeros(2)),    # far from 0
    }
    picked = T.sample_self_adversarial_negatives(
        [(0, 1), (0, 2)], boxes.get, 1, 1.0)
    assert picked == [0]  # the overlapping (hard) pair ranks first

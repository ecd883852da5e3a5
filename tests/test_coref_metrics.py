"""E4 — coref metrics parity tests, transcribed from the reference's
unit + property suites (anno/src/eval/coref_metrics.rs:1536-1870).

Chains use (start, end) span ids like the reference's SpanId. Pure
Python — no Spark session needed.
"""

from __future__ import annotations

from anno_spark.eval.coref_metrics import (
    b_cubed_score,
    blanc_score,
    ceaf_e_score,
    ceaf_m_score,
    conll_f1,
    evaluate_coref,
    lea_score,
    muc_score,
)

# make_chain(&[("John", 0, 4), ...]) — span ids only matter
JOHN = [(0, 4), (20, 22), (40, 43)]
MARY = [(5, 9), (25, 28)]


class TestReferenceCases:
    def test_perfect_match(self):
        # coref_metrics.rs:1744-1778
        gold = [JOHN, MARY]
        pred = [list(c) for c in gold]
        for fn in (muc_score, b_cubed_score, ceaf_e_score, lea_score, blanc_score):
            assert abs(fn(pred, gold).f1 - 1.0) < 1e-3, fn.__name__
        assert abs(conll_f1(pred, gold) - 1.0) < 1e-3

    def test_no_overlap(self):
        # coref_metrics.rs:1780-1790
        gold = [[(0, 4), (20, 22)]]
        pred = [[(5, 9), (25, 28)]]
        assert muc_score(pred, gold).f1 < 1e-3
        assert b_cubed_score(pred, gold).f1 < 1e-3

    def test_partial_match(self):
        # split one chain into two (coref_metrics.rs:1793-1820)
        gold = [JOHN]
        pred = [[(0, 4), (20, 22)], [(40, 43)]]
        muc = muc_score(pred, gold).f1
        b3 = b_cubed_score(pred, gold).f1
        assert 0.0 < muc < 1.0
        assert 0.0 < b3 < 1.0

    def test_singleton_handling(self):
        # B³/BLANC credit singletons (coref_metrics.rs:1823-1843)
        gold = [[(0, 4)], MARY]
        pred = [list(c) for c in gold]
        assert abs(b_cubed_score(pred, gold).f1 - 1.0) < 1e-3
        assert abs(blanc_score(pred, gold).f1 - 1.0) < 1e-3

    def test_empty_chains(self):
        assert muc_score([], []).f1 == 0.0


class TestReferenceProperties:
    SCENARIOS = [
        # over-clustering (coref_metrics.rs:1570-1578)
        ([[(0, 1), (2, 3), (4, 5)]], [[(0, 1)], [(2, 3)], [(4, 5)]]),
        # under-clustering
        ([[(0, 1)], [(2, 3)], [(4, 5)]], [[(0, 1), (2, 3), (4, 5)]]),
        # partial overlap
        ([[(0, 1), (2, 3)], [(4, 5)]], [[(0, 1)], [(2, 3), (4, 5)]]),
    ]

    def test_property_perfect_match_is_one(self):
        for gold in (
            [[(0, 1), (2, 3)]],
            [[(0, 1), (2, 3)], [(4, 5), (6, 7)]],
            [[(0, 1), (2, 3), (4, 5), (6, 7)]],
        ):
            assert abs(conll_f1(gold, gold) - 1.0) < 1e-3

    def test_property_scores_bounded(self):
        for pred, gold in self.SCENARIOS:
            out = evaluate_coref(pred, gold)
            for name, v in out.items():
                vals = [v] if isinstance(v, float) else list(v.as_tuple())
                for s in vals:
                    assert 0.0 <= s <= 1.0, (name, s)

    def test_property_f1_is_harmonic_mean(self):
        pred = [[(0, 1), (2, 3)]]
        gold = [[(0, 1), (4, 5)], [(2, 3)]]
        for fn in (muc_score, b_cubed_score, ceaf_e_score, lea_score):
            m = fn(pred, gold)
            if m.precision + m.recall > 0:
                expect = 2 * m.precision * m.recall / (m.precision + m.recall)
                assert abs(m.f1 - expect) < 1e-3, fn.__name__

    def test_property_conll_is_average(self):
        pred = [[(0, 1), (2, 3)], [(4, 5)]]
        gold = [[(0, 1)], [(2, 3), (4, 5)]]
        expect = (
            muc_score(pred, gold).f1
            + b_cubed_score(pred, gold).f1
            + ceaf_e_score(pred, gold).f1
        ) / 3.0
        assert abs(conll_f1(pred, gold) - expect) < 1e-3

    def test_property_symmetric_clustering_errors(self):
        # coref_metrics.rs:1689-1738: B³/CEAFe symmetric over↔under
        gold_over = [[(0, 1)], [(2, 3)], [(4, 5)]]
        pred_over = [[(0, 1), (2, 3), (4, 5)]]
        b3_over = b_cubed_score(pred_over, gold_over).f1
        ce_over = ceaf_e_score(pred_over, gold_over).f1
        b3_under = b_cubed_score(gold_over, pred_over).f1
        ce_under = ceaf_e_score(gold_over, pred_over).f1
        assert abs(b3_over - b3_under) < 1e-3
        assert abs(ce_over - ce_under) < 1e-3

    def test_ceaf_m_known_value(self):
        # hand-computed: pred [[a,b],[c]] gold [[a],[b,c]]
        # φ3: ([a,b],[a]) = 2/3; ([a,b],[b,c]) = 1/2; ([c],[b,c]) = 2/3
        # greedy picks ([a,b],[a])=2/3 then ([c],[b,c])=2/3 → sim=4/3
        # P = (4/3)/2, R = (4/3)/2
        pred = [[(0, 1), (2, 3)], [(4, 5)]]
        gold = [[(0, 1)], [(2, 3), (4, 5)]]
        m = ceaf_m_score(pred, gold)
        assert abs(m.precision - 2 / 3) < 1e-9
        assert abs(m.recall - 2 / 3) < 1e-9

    def test_muc_known_value(self):
        # gold [[a,b,c]] pred [[a,b],[c]]: R = (3-2)/(3-1) = .5
        # P: chain [a,b] → partitions{gold0} → (2-1)/(2-1)=1; [c] singleton skipped
        gold = [[(0, 1), (2, 3), (4, 5)]]
        pred = [[(0, 1), (2, 3)], [(4, 5)]]
        m = muc_score(pred, gold)
        assert abs(m.recall - 0.5) < 1e-9
        assert abs(m.precision - 1.0) < 1e-9

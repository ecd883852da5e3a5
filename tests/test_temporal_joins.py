"""As-of and range join semantics: at-or-before inclusivity, tie
resolution, no-match nulls, tolerance boundary, and plan shape."""

from __future__ import annotations

import datetime as dt

from anno_spark.operators.temporal import asof_join, range_join

EV_DDL = "event_id bigint, ts timestamp, user_id bigint, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, 0, s), u, v) for i, s, u, v in rows],
        EV_DDL,
    )


class TestAsofJoin:
    def test_most_recent_at_or_before(self, spark):
        left = _ev(spark, [(100, 30, 1, 0.0), (101, 5, 1, 0.0)])
        right = _ev(spark, [(200, 10, 1, 1.0), (201, 20, 1, 2.0), (202, 40, 1, 3.0)])
        out = {r["event_id"]: r for r in asof_join(left, right).collect()}
        assert out[100]["r_event_id"] == 201  # 20s is latest <= 30s
        assert out[101]["r_event_id"] is None  # nothing at or before 5s

    def test_exact_timestamp_is_inclusive(self, spark):
        left = _ev(spark, [(100, 10, 1, 0.0)])
        right = _ev(spark, [(200, 10, 1, 5.0)])
        (row,) = asof_join(left, right).collect()
        assert row["r_event_id"] == 200 and row["r_value"] == 5.0

    def test_tie_resolves_to_greatest_tie_col(self, spark):
        left = _ev(spark, [(100, 10, 1, 0.0)])
        right = _ev(spark, [(200, 10, 1, 1.0), (205, 10, 1, 2.0)])
        (row,) = asof_join(left, right).collect()
        assert row["r_event_id"] == 205

    def test_keys_do_not_leak(self, spark):
        left = _ev(spark, [(100, 30, 1, 0.0)])
        right = _ev(spark, [(200, 10, 2, 1.0)])  # other user
        (row,) = asof_join(left, right).collect()
        assert row["r_event_id"] is None

    def test_single_shuffle_no_join(self, spark):
        left = _ev(spark, [(100, 30, 1, 0.0)])
        right = _ev(spark, [(200, 10, 1, 1.0)])
        plan = (
            asof_join(left, right)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # window implementation: union + one hashpartitioning exchange,
        # NO join operator of any kind
        assert "Join" not in plan.replace("JoinType", "")
        assert "Window" in plan


class TestRangeJoin:
    def test_tolerance_inclusive_boundary(self, spark):
        left = _ev(spark, [(100, 30, 1, 0.0)])
        right = _ev(spark, [(200, 20, 1, 1.0), (201, 19, 1, 2.0)])
        got = {
            r["r_event_id"]
            for r in range_join(left, right, tolerance_seconds=10).collect()
        }
        assert got == {200}  # |30-20| = 10 inclusive; |30-19| = 11 out

    def test_no_cartesian_in_plan(self, spark):
        left = _ev(spark, [(100, 30, 1, 0.0)])
        right = _ev(spark, [(200, 20, 1, 1.0)])
        plan = (
            range_join(left, right)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

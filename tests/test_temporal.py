"""Unit tests for the as-of join (operators/temporal.py)."""

from __future__ import annotations

import pytest

from hadoop_data_pipeline_spark.operators import temporal


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 205),   # strictly after right@200
            (3, "u1", 200),   # exactly AT right@200 -> matches it
            (4, "u2", 50),    # u2 has no right rows at all
            (5, "u1", 10),    # before every right row
        ],
        "event_id bigint, user_id string, t bigint",
    )
    right = spark.createDataFrame(
        [
            (11, "u1", 90, 1.0),
            (12, "u1", 200, 2.0),
            (13, "u1", 200, 3.0),  # tie on ts -> max event_id (13) wins
            (14, "u1", 300, 4.0),
        ],
        "event_id bigint, user_id string, t bigint, v double",
    )
    return left, right


def test_asof_inner_matches(spark, sides):
    left, right = sides
    out = temporal.asof_join(
        left, right, on=["user_id"], ts_col="t",
        payload_cols=["v"], tie_cols=["event_id"],
    )
    got = {r.event_id: (r.asof_ts, r.asof_v) for r in out.collect()}
    assert got == {
        1: (90, 1.0),    # latest at-or-before 100
        2: (200, 3.0),   # tie at 200 broken by max right event_id
        3: (200, 3.0),   # equal timestamp matches ("at or before")
        # 4: dropped (no match, inner)
        # 5: dropped (no right row at-or-before t=10)
    }


def test_asof_left_keeps_unmatched(spark, sides):
    left, right = sides
    out = temporal.asof_join(
        left, right, on=["user_id"], ts_col="t",
        payload_cols=["v"], tie_cols=["event_id"], how="left",
    )
    got = {r.event_id: r.asof_ts for r in out.collect()}
    assert got[4] is None and got[5] is None and len(got) == 5


def test_asof_rejects_bad_how(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="how"):
        temporal.asof_join(
            left, right, on=["user_id"], ts_col="t",
            payload_cols=["v"], how="outer",
        )


def test_asof_single_shuffle_plan(spark, sides):
    # The union-merge form must plan exactly one hash exchange (on the
    # join key) — the whole point vs. a range join.
    left, right = sides
    out = temporal.asof_join(
        left, right, on=["user_id"], ts_col="t", payload_cols=["v"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

"""Unit tests for entity resolution (operators/entity.py) and SCD2
state history (operators/temporal.py::scd2_history) on planted
fixtures; catalog-level oracle checks run in test_catalog_oracle.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.operators import entity, temporal


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 0, 0, s)


def test_fuzzy_pairs_within_block(spark):
    df = spark.createDataFrame(
        [
            (1, "cold widget"),
            (2, "bold widget"),   # dist 1 vs id 1, same block
            (3, "small widget"),  # dist >2 vs both
            (4, "large bolt"),    # different block entirely
            (5, "cold widget"),   # duplicate name: collapses into id 1's group
        ],
        "pid long, name string",
    )
    got = entity.fuzzy_dup_pairs(df, "name", "pid", max_dist=2).collect()
    assert [
        (r.rep_id_a, r.rep_id_b, r.n_a, r.n_b, r.edit_dist) for r in got
    ] == [(1, 2, 2, 1, 1)]
    assert got[0].name_a == "cold widget" and got[0].name_b == "bold widget"


def test_fuzzy_pairs_blocking_is_exact_within_block(spark):
    # the length band never drops a true pair: |len diff| <= d is
    # necessary for levenshtein <= d
    df = spark.createDataFrame(
        [(1, "ax rod"), (2, "axx rod"), (3, "axxxxx rod")],
        "pid long, name string",
    )
    got = sorted(
        (r.rep_id_a, r.rep_id_b)
        for r in entity.fuzzy_dup_pairs(df, "name", "pid", max_dist=2).collect()
    )
    # (1,2): dist 1 kept; (2,3): dist 3 dropped; (1,3): dist 4 dropped
    assert got == [(1, 2)]


def test_scd2_runs_collapse(spark):
    rows = [
        (1, "A", _ts(1), 101),
        (1, "A", _ts(2), 102),
        (1, "B", _ts(3), 103),
        (1, "A", _ts(4), 104),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    hist = sorted(
        temporal.scd2_history(
            df, ["user_id"], "event_type", "ts", tie_cols=["event_id"]
        ).collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.event_type, r.n_events) for r in hist] == [
        ("A", 2), ("B", 1), ("A", 1)
    ]
    assert hist[0].valid_to == hist[1].valid_from == _ts(3)
    assert hist[1].valid_to == hist[2].valid_from == _ts(4)
    assert hist[2].valid_to is None  # current state


def test_scd2_equal_ts_flip_is_deterministic(spark):
    # two state flips at the SAME timestamp: event_id breaks the tie,
    # islands keep the chain unique (valid_from repeats, island doesn't)
    rows = [
        (7, "X", _ts(5), 1),
        (7, "Y", _ts(5), 2),
        (7, "Y", _ts(9), 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    hist = sorted(
        temporal.scd2_history(
            df, ["user_id"], "event_type", "ts", tie_cols=["event_id"]
        ).collect(),
        key=lambda r: (r.valid_from, r.valid_to is None, r.valid_to),
    )
    assert [(r.event_type, r.n_events) for r in hist] == [("X", 1), ("Y", 2)]
    assert hist[0].valid_from == hist[1].valid_from == _ts(5)
    assert hist[0].valid_to == _ts(5) and hist[1].valid_to is None


def test_resample_daily_ffill_fills_gaps(spark):
    # user 1: days 1, 2, 5 observed -> days 3, 4 filled from day 2
    rows = [
        (1, dt.datetime(2026, 3, 1, 10), 5.0),
        (1, dt.datetime(2026, 3, 1, 11), 3.0),   # same day aggregates
        (1, dt.datetime(2026, 3, 2, 9), 7.0),
        (1, dt.datetime(2026, 3, 5, 1), 2.0),
        (2, dt.datetime(2026, 3, 9, 0), 1.0),    # single-day user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = temporal.resample_daily_ffill(df, ["user_id"], "ts", "value")
    got = {
        (r.user_id, r.day.day): r for r in out.collect()
    }
    assert len(got) == 6  # user 1: days 1-5; user 2: day 9
    assert got[(1, 1)].day_value == 8.0 and got[(1, 1)].is_observed
    assert got[(1, 2)].day_value == 7.0
    for d in (3, 4):
        r = got[(1, d)]
        assert r.day_value is None and not r.is_observed
        assert r.filled_value == 7.0  # carried from day 2
    assert got[(1, 5)].filled_value == 2.0
    assert got[(2, 9)].filled_value == 1.0


def test_resample_never_crosses_keys(spark):
    # a key's fill must come from ITS OWN history, not another key's
    rows = [
        (1, dt.datetime(2026, 3, 1), 100.0),
        (1, dt.datetime(2026, 3, 3), 50.0),
        (2, dt.datetime(2026, 3, 2), 999.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = temporal.resample_daily_ffill(df, ["user_id"], "ts", "value")
    gap = [r for r in out.collect() if r.user_id == 1 and r.day.day == 2]
    assert len(gap) == 1 and gap[0].filled_value == 100.0


def test_funnel_requires_strict_order(spark):
    from hadoop_data_pipeline_spark.operators import analytics

    rows = [
        # user 1: full funnel in order
        (1, "view", _ts(1), 1),
        (1, "click", _ts(2), 2),
        (1, "purchase", _ts(3), 3),
        # user 2: purchase BEFORE click -> only view+click credit
        (2, "view", _ts(1), 4),
        (2, "purchase", _ts(2), 5),
        (2, "click", _ts(3), 6),
        # user 3: click with no prior view -> no credit past step 1? no:
        # user 3 never views, so not even step 1
        (3, "click", _ts(1), 7),
        (3, "purchase", _ts(2), 8),
        # user 4: view only
        (4, "view", _ts(5), 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {
        r.step: r.n_users
        for r in analytics.funnel_conversion(
            df, ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_ts_uses_tie_order(spark):
    from hadoop_data_pipeline_spark.operators import analytics

    # click at the SAME ts as view: strictly-before means the view must
    # sort earlier by (ts, event_id)
    rows = [
        (1, "view", _ts(1), 1),
        (1, "click", _ts(1), 2),   # view (id 1) sorts before -> counts
        (2, "click", _ts(1), 3),
        (2, "view", _ts(1), 4),    # view sorts after click -> no credit
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {
        r.step: r.n_users
        for r in analytics.funnel_conversion(df, ["view", "click"]).collect()
    }
    assert got == {"view": 2, "click": 1}


def test_funnel_rejects_single_step(spark):
    from hadoop_data_pipeline_spark.operators import analytics

    df = spark.createDataFrame([(1, "view", _ts(1), 1)],
        "user_id long, event_type string, ts timestamp, event_id long")
    import pytest as _pt
    with _pt.raises(ValueError):
        analytics.funnel_conversion(df, ["view"])


def test_cohort_retention_hand_case(spark):
    from hadoop_data_pipeline_spark.operators import analytics

    # weeks: 2026-03-02 and 2026-03-09 are Mondays
    rows = [
        (1, dt.datetime(2026, 3, 3)),    # cohort wk0, active wk0
        (1, dt.datetime(2026, 3, 10)),   # ... and wk1
        (2, dt.datetime(2026, 3, 4)),    # cohort wk0, wk0 only
        (3, dt.datetime(2026, 3, 11)),   # cohort wk1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.date().isoformat(), r.week_offset): r.n_users
        for r in analytics.cohort_retention(df).collect()
    }
    assert got == {
        ("2026-03-02", 0): 2,
        ("2026-03-02", 1): 1,
        ("2026-03-09", 0): 1,
    }

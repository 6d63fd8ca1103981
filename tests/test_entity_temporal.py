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

"""Binned range joins + sweep-line concurrency (operators/ranges.py)
against brute-force references — including intervals longer than the
bin width (multi-bin spans), negative coordinates, and coincident
boundaries, the cases where the bin arithmetic could silently drop or
duplicate pairs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.operators import ranges

BIN_W = 7  # deliberately small so many intervals span several bins


def _random_intervals(rng, n, lo=-40, hi=60, max_len=23):
    out = []
    for i in range(n):
        s = rng.randint(lo, hi)
        out.append((i, s, s + rng.randint(0, max_len)))
    return out


@pytest.fixture(scope="module")
def fixtures(spark):
    rng = random.Random(20160817)
    iv = _random_intervals(rng, 120)
    pts = [(j, rng.randint(-45, 90)) for j in range(150)]
    ivdf = spark.createDataFrame(iv, "iid long, s long, e long")
    ptdf = spark.createDataFrame(pts, "pid long, x long")
    return iv, pts, ivdf, ptdf


def test_range_join_point_matches_brute_force(fixtures):
    iv, pts, ivdf, ptdf = fixtures
    got = sorted(
        (r.pid, r.iid)
        for r in ranges.range_join_point(
            ptdf, ivdf, "x", "s", "e", BIN_W
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, x in pts
        for iid, s, e in iv
        if s <= x <= e
    )
    assert got == want and want  # non-degenerate fixture


def test_range_join_intervals_each_pair_exactly_once(spark, fixtures):
    """Multi-bin intervals can collide in several bins; the
    anchored-bin filter must keep each overlapping pair exactly once
    (no distinct() in the operator)."""
    iv, _, _, _ = fixtures
    a = spark.createDataFrame(iv, "k1 long, s1 long, e1 long")
    b = spark.createDataFrame(iv, "k2 long, s2 long, e2 long")
    rows = ranges.range_join_intervals(
        a, b, ("s1", "e1"), ("s2", "e2"), BIN_W
    ).collect()
    got = sorted((r.k1, r.k2) for r in rows)
    assert len(got) == len(set(got)), "duplicate pair emitted"
    want = sorted(
        (k1, k2)
        for k1, s1, e1 in iv
        for k2, s2, e2 in iv
        if s1 <= e2 and s2 <= e1
    )
    assert got == want


def test_range_join_intervals_respects_equality_keys(spark):
    rows = [("a", 1, 0, 10), ("a", 2, 5, 15), ("b", 3, 0, 10)]
    a = spark.createDataFrame(rows, "g string, k1 long, s1 long, e1 long")
    b = spark.createDataFrame(
        [(g, k, s, e) for g, k, s, e in rows],
        "g string, k2 long, s2 long, e2 long",
    )
    got = sorted(
        (r.g, r.k1, r.k2)
        for r in ranges.range_join_intervals(
            a, b, ("s1", "e1"), ("s2", "e2"), BIN_W, on=["g"]
        ).collect()
    )
    # 1 and 2 overlap within group a; 3 never meets them (group b)
    assert got == [
        ("a", 1, 1), ("a", 1, 2), ("a", 2, 1), ("a", 2, 2), ("b", 3, 3)
    ]


def test_interval_concurrency_matches_point_evaluation(spark, fixtures):
    iv, _, ivdf, _ = fixtures
    conc = {
        r.axis: r.concurrent
        for r in ranges.interval_concurrency(ivdf, "s", "e").collect()
    }

    def brute(x):
        return sum(1 for _, s, e in iv if s <= x <= e)

    # at every breakpoint the sweep value equals the point count, and
    # the value HOLDS until the next breakpoint (check midpoints too)
    bps = sorted(conc)
    for i, x in enumerate(bps):
        assert conc[x] == brute(x), f"at breakpoint {x}"
        if i + 1 < len(bps) and bps[i + 1] - x > 1:
            mid = (x + bps[i + 1]) // 2
            assert conc[x] == brute(mid), f"between {x} and {bps[i + 1]}"
    # closed-interval convention: e is active, e+1 is not
    _, s0, e0 = iv[0]
    assert brute(e0) >= 1


def test_interval_concurrency_keys_and_coincident_bounds(spark):
    # three identical intervals in one key: deltas collapse map-side
    # to a single +3/-3 pair; peak must be 3, not three rows of 1
    df = spark.createDataFrame(
        [("g", 5, 9)] * 3 + [("h", 5, 9)], "k string, s long, e long"
    )
    rows = ranges.interval_concurrency(df, "s", "e", on=["k"]).collect()
    got = {(r.k, r.axis): r.concurrent for r in rows}
    assert got == {("g", 5): 3, ("g", 10): 0, ("h", 5): 1, ("h", 10): 0}


def test_range_join_plans_are_hash_joins(spark, fixtures):
    """The whole point of binning: the physical plan must contain a
    hash join (broadcast or shuffled), never BroadcastNestedLoopJoin
    or CartesianProduct."""
    _, _, ivdf, ptdf = fixtures
    for df in (
        ranges.range_join_point(ptdf, ivdf, "x", "s", "e", BIN_W),
        ranges.range_join_intervals(
            ivdf.select(
                F.col("iid").alias("k1"),
                F.col("s").alias("s1"),
                F.col("e").alias("e1"),
            ),
            ivdf.select(
                F.col("iid").alias("k2"),
                F.col("s").alias("s2"),
                F.col("e").alias("e2"),
            ),
            ("s1", "e1"),
            ("s2", "e2"),
            BIN_W,
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        # equi-join on the bin id: hash or sort-merge, planner's pick
        # (statless ExistingRDD inputs get SMJ; parquet sources with
        # size stats broadcast — both are bin-partitioned equi-joins)
        assert "HashJoin" in plan or "SortMergeJoin" in plan

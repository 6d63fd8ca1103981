"""Tests for layout clustering (operators/layout.py) and quarantine
CSV ingestion (sources/readers.py::read_csv_quarantine)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoop_data_pipeline_spark.operators import layout
from hadoop_data_pipeline_spark.sources.readers import (
    load_table,
    read_csv_quarantine,
)

SF = "/root/testdata/sf0.001"


def test_cluster_for_scan_disjoint_file_ranges(spark, tmp_path):
    out = str(tmp_path / "clustered")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    layout.cluster_for_scan(ev, ["user_id"], n_partitions=8).write.parquet(out)
    # every written file must cover a user_id range disjoint from all
    # the others — the property parquet min/max pruning feeds on.
    ranges = []
    for f in glob.glob(os.path.join(out, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        col_idx = names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # actually range-split, not one file
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"
    # and nothing was lost
    assert (
        spark.read.parquet(out).count() == ev.count()
    )


def test_cluster_for_scan_plan_is_range_exchange(spark):
    ev = load_table(spark, SF, "events")
    plan = (
        layout.cluster_for_scan(ev, ["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan
    assert "Sort" in plan
    # in-partition sort only: no second (global) exchange after the range one
    assert plan.count("Exchange") == 1


def test_cluster_for_scan_rejects_empty_cols(spark):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError):
        layout.cluster_for_scan(ev, [])


def test_quarantine_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,name\n"
        "1,10,ok-row\n"
        "2,notanumber,bad-cast\n"
        "3,30,ok-row-2\n"
        '4,"unclosed quote,breaks\n'
        "5,50,ok-row-3\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("qty", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == [1, 3, 5]
    assert "_corrupt_record" not in good.columns
    raw = [r["_corrupt_record"] for r in bad.collect()]
    assert len(raw) == 2
    assert any("notanumber" in r for r in raw)  # raw line preserved

"""Bucketed tables for co-located joins (SURVEY.md §7.2 step 9).

At 100 TB the dominant cost of a fact-fact join (orders x lineitem)
is shuffling both sides on the key. Hive-style bucketing pays that
shuffle ONCE at write: both tables are hash-partitioned into the same
number of buckets on the join key and each bucket is sorted, so later
joins read bucket i against bucket i directly — `.explain` shows a
SortMergeJoin with NO Exchange on either side (pinned by
``tests/test_bucketing.py``).

Rules that make it work (violating any re-introduces the shuffle):
* same bucket count on both tables (or an integer multiple);
* join keys == bucket keys (a superset of columns breaks it);
* ``spark.sql.sources.bucketing.enabled`` (default true), and shuffle
  partitions don't matter — bucket count drives parallelism.

Repeated aggregation on the bucket key also skips its exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (+ optionally sorted) parquet table
    registered in the catalog (bucket layout lives in table metadata —
    a bare directory cannot carry it)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables. With matching bucket layouts this
    plans as a shuffle-free sort-merge join."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)

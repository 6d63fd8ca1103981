"""Data-layout operators: clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet stores per-row-group min/max statistics, and a scan with a
pushed-down predicate skips every row group whose range excludes the
value. That only pays off if the data is CLUSTERED on the filter
column — random layout makes every row group's range span the whole
domain, so nothing is ever skipped.

``cluster_for_scan`` is the write-side half of that contract:
range-partition on the cluster columns (each output file covers a
disjoint value range) and sort within partitions (row groups inside a
file cover disjoint sub-ranges). A point or range predicate on the
cluster columns then touches one file and a handful of row groups,
regardless of table size. This is the single-dimension version of
what Z-ordering/Liquid clustering do for multi-column predicates;
for one dominant filter column (tenant id, date, user id) it is
optimal and needs no engine extension.

Cost model: one range exchange (sampling pass picks the bounds, AQE
balances skew) + per-partition sort — the same price as any global
sort, paid ONCE at write time, repaid on every subsequent scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def cluster_for_scan(
    df: DataFrame,
    cols: Sequence[str],
    n_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + in-partition sort on ``cols`` so a subsequent
    parquet write produces files with pairwise-disjoint value ranges
    and internally sorted row groups (max min/max pruning for filters
    on ``cols``). Pass the result straight to ``.write.parquet``.

    ``n_partitions`` defaults to Spark's shuffle partition count; set
    it to target a file size (total_bytes / desired_file_bytes) — at
    scale, files of 128-1024 MB keep both the footer count and the
    task count sane.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cluster_for_scan needs at least one column")
    if n_partitions is not None:
        rp = df.repartitionByRange(n_partitions, *cols)
    else:
        rp = df.repartitionByRange(*cols)
    return rp.sortWithinPartitions(*cols)

"""Incremental aggregate maintenance (materialized-view refresh).

At 100 TB you never recompute an aggregate over the whole history
when a day of data arrives: you keep PARTIAL aggregates (count / sum /
min / max — the mergeable algebra) per (key, grain) and MERGE the new
batch's partials in. This module is that contract:

    agg(full) == merge(agg(batch_1), agg(batch_2), ...)

for every function in the mergeable set, proven by the catalog oracle
(the merged two-batch result is hash-compared against DuckDB's direct
single-pass aggregate over the full table).

Non-mergeable aggregates (avg, stddev) are DERIVED at read time from
mergeable ones (avg = sum/count) — never stored, or refresh breaks.
Sums ride on integer cents (exact, associative) so the merge is
bit-identical regardless of batch boundaries or partition order —
float sums are not associative, and an aggregate store whose content
depends on ingest batching is corrupt by construction.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_daily_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Mergeable partial aggregate at (key, day) grain: n_rows,
    sum_cents (exact bigint), min_cents, max_cents. This is the frame
    a materialized aggregate store persists per ingest batch."""
    keys = list(key_cols)
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return (
        df.select(
            *keys,
            F.date_trunc("DAY", F.col(ts_col)).alias("day"),
            cents.alias("__c"),
        )
        .groupBy(*keys, "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__c").alias("sum_cents"),
            F.min("__c").alias("min_cents"),
            F.max("__c").alias("max_cents"),
        )
    )


def merge_partial_aggs(parts: Sequence[DataFrame], key_cols: Sequence[str]) -> DataFrame:
    """Merge any number of partial-aggregate frames produced by
    :func:`partial_daily_agg` (count->sum, sum->sum, min->min,
    max->max). Exact: integer algebra only, so the result is identical
    for ANY batch split of the same rows."""
    keys = list(key_cols) + ["day"]
    if not parts:
        raise ValueError("merge_partial_aggs needs at least one frame")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
    )


def read_view(agg: DataFrame) -> DataFrame:
    """Read-time projection of the aggregate store: derived metrics
    (sum/min/max in currency units, avg) from the mergeable columns."""
    return agg.select(
        *[c for c in agg.columns if not c.endswith("_cents")],
        (F.col("sum_cents") / 100.0).alias("sum_value"),
        (F.col("min_cents") / 100.0).alias("min_value"),
        (F.col("max_cents") / 100.0).alias("max_value"),
        F.round(F.col("sum_cents") / 100.0 / F.col("n_rows"), 6).alias(
            "avg_value"
        ),
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two tables (migration validation, replica
    anti-entropy): one row per status with its count —
    ``added`` (key only in b), ``removed`` (key only in a),
    ``changed`` (key in both, compared columns differ),
    ``unchanged``. The exact check a reference-to-new-engine cutover
    needs beyond a whole-table checksum: the checksum says "different",
    the diff says where and how much.

    Scale shape: each side collapses to (key, md5-of-compared-columns)
    BEFORE the join — wide rows never shuffle; the FULL OUTER join on
    the key is the only exchange; the status aggregate is 4 rows.
    Contract: ``key_cols`` must uniquely identify rows on each side
    (a diff without a primary key is not well-defined; duplicate keys
    would cross-product in the join).
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in a.columns if c not in keys]
    digest = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in compare_cols]
        )
    )
    da = a.select(*keys, digest.alias("__da"))
    db = b.select(*keys, digest.alias("__db"))
    joined = da.join(db, keys, "full_outer")
    status = (
        F.when(F.col("__da").isNull(), F.lit("added"))
        .when(F.col("__db").isNull(), F.lit("removed"))
        .when(F.col("__da") != F.col("__db"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def emit_changelog(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Snapshot diff -> CDC changelog: one row per changed key with
    ``op`` in {insert, update, delete} — the INVERSE of the merge in
    `cdc_upsert` (apply ``emit_changelog(a, b)`` onto ``a`` and you
    get ``b``). Inserts/updates carry the NEW values, deletes carry
    the OLD values (the row being erased), matching Delta/Iceberg
    change-data-feed conventions.

    Scale shape: one full-outer hash exchange on the key; unchanged
    rows are filtered before anything is emitted. Values ride the
    join here because a changelog must carry them anyway; for very
    wide tables diff (key, digest) first — `table_diff` — and join
    the changed keys back for values, trading a second (tiny) join
    for a narrow first exchange.
    """
    o = old.select(
        *keys,
        F.lit(True).alias("__o_exists"),
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__n_exists"),
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
    )
    j = o.join(n, list(keys), "full_outer")
    # presence flags, not value-null checks: a legitimately-NULL value
    # column must not read as "row absent".
    old_present = F.col("__o_exists").isNotNull()
    new_present = F.col("__n_exists").isNotNull()
    # F.lit(False) initializer: with no value columns the diff is
    # membership-only (inserts/deletes), not a crash.
    changed = functools.reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
            for c in value_cols
        ],
        F.lit(False),
    )
    op = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    # insert/update emit NEW values even when a new value is NULL
    # (coalesce would silently resurrect the old value); delete emits
    # the OLD row being erased.
    out_vals = [
        F.when(new_present, F.col(f"__n_{c}"))
        .otherwise(F.col(f"__o_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return (
        j.select(*keys, op.alias("op"), *out_vals)
        .where(F.col("op").isNotNull())
    )

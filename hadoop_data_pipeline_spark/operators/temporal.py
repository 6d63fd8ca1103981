"""Temporal joins (north-star extension): as-of join.

Spark has no native as-of join (pandas ``merge_asof`` semantics: each
left row matched with the single most recent right row at-or-before
its timestamp, per key). The naive SQL formulation is a range join —
``l JOIN r ON key AND r.ts <= l.ts`` — whose candidate set is
O(left × right-history) per key before the per-row argmax prunes it;
at 100 TB that intermediate is the job killer.

This implementation is the UNION-MERGE form: tag both sides, union
them, and run ONE window over (key) ordered by (ts, side, tie): each
left row picks up the last non-null right payload seen so far in the
sort. Cost is one hash shuffle on the key plus one per-partition sort
— identical to any grouped window aggregate, linear in |L| + |R|,
and the range intermediate never exists. This is the same merge-scan
shape single-node engines (pandas, DuckDB ASOF) use, expressed as a
distributed window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tie_cols: Sequence[str] = (),
    prefix: str = "asof_",
    how: str = "inner",
) -> DataFrame:
    """As-of join: for every left row, the right row with the greatest
    ``ts_col`` <= left's ``ts_col`` within the same ``on`` key.

    Ties on the right timestamp are broken by ``tie_cols`` ascending —
    the LAST row in (ts, tie) order wins, i.e. the max tie value, so
    results are deterministic for any input. Right rows AT the left
    timestamp match ("at or before").

    Returns all left columns plus ``{prefix}ts`` and
    ``{prefix}{payload}`` for each payload column. ``how='left'``
    keeps unmatched left rows with null match columns; ``'inner'``
    drops them.
    """
    on = list(on)
    rpay = F.struct(
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col).alias("__t"),
        *[F.col(c).alias(f"__tie{i}") for i, c in enumerate(tie_cols)],
        rpay.alias("__rpay"),
        F.lit(0).alias("__is_left"),
    )
    l_side = left.select(
        "*",
        F.col(ts_col).alias("__t"),
        F.lit(1).alias("__is_left"),
    )
    both = l_side.unionByName(r, allowMissingColumns=True)
    # Right rows sort before left rows at the same timestamp
    # (__is_left 0 < 1), so an equal-ts right row IS visible to the
    # left row's running last(); among equal-ts right rows the tie
    # columns ascending put the winner last. Left rows' null tie
    # columns are irrelevant: __is_left already separates the sides.
    order = [F.col("__t"), F.col("__is_left")] + [
        F.col(f"__tie{i}") for i in range(len(tie_cols))
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
    out = matched.where(F.col("__is_left") == 1)
    if how == "inner":
        out = out.where(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        F.col(f"__m.{prefix}ts").alias(f"{prefix}ts"),
        *[
            F.col(f"__m.{prefix}{c}").alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )

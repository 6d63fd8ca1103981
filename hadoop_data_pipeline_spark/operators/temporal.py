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


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    state_col: str,
    ts_col: str,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a per-key event stream into SCD2 validity intervals:
    one row per *run* of consecutive equal ``state_col`` values, with
    ``valid_from`` (first event of the run), ``valid_to`` (start of
    the next run, NULL for the current state) and ``n_events`` (run
    length) — the slowly-changing-dimension type-2 load, derived from
    an event log by gaps-and-islands.

    Determinism: events are ordered by (ts, tie_cols); two runs can
    share a ``valid_from`` when a state flips twice at the same
    timestamp, so the ``valid_to`` lead orders by (valid_from, island)
    — island ids are monotone in event order, making the interval
    chain unique for any input.

    Scale shape: both event-level windows (lag flag, running island
    sum) share ONE hash exchange + sort on (key, ts) — Catalyst reuses
    the sorted exchange; the island aggregate then shrinks the data to
    one row per run BEFORE the final lead window, which runs on the
    collapsed frame. No self-join, no range join; cost is one shuffle
    of (key, state, ts) triples.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col, *tie_cols)
    prev = F.lag(state_col).over(w)
    flagged = df.withColumn(
        "__chg",
        F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    hist = islands.groupBy(*keys, "__island").agg(
        F.min(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from", "__island")
    return (
        hist.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(*keys, state_col, "valid_from", "valid_to", "n_events")
    )


def resample_daily_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Resample an irregular event stream onto a regular DAILY grid
    per key, forward-filling days with no events — the time-series
    normalization step (feature grids, charting, joining series with
    different cadences). For every key, the grid spans that key's
    [first, last] observed day; output is one row per (key, day):
    ``day_value`` (the day's aggregated value, NULL when unobserved),
    ``filled_value`` (last observed day's value carried forward),
    ``is_observed``.

    Scale shape: the daily pre-aggregate shrinks events to one row
    per (key, day) BEFORE any spine work, so the explode and the join
    operate on the compacted frame; the date spine is generated
    per-key with ``sequence`` (cost = days-in-span per key, never a
    global calendar cross join); the forward fill is one window per
    key over the bounded daily grid. Keys with multi-decade spans and
    billions of events still produce only span-days rows each.
    """
    keys = list(key_cols)
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (
        df.groupBy(*keys, day.alias("day"))
        .agg(F.round(F.sum(value_col), decimals).alias("day_value"))
    )
    spine = (
        daily.groupBy(*keys)
        .agg(F.min("day").alias("__mn"), F.max("day").alias("__mx"))
        .select(
            *keys,
            F.explode(
                F.sequence("__mn", "__mx", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    grid = spine.join(daily, keys + ["day"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        *keys,
        "day",
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("day_value").isNotNull().alias("is_observed"),
    )

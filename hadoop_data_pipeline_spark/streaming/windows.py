"""Event-time windowed aggregations (SURVEY.md §2.10).

Each transform takes a DataFrame that may be BATCH or STREAMING — the
expressions are identical; only the watermark is conditional (batch
DataFrames reject ``withWatermark``... actually accept but ignore; we
gate on ``df.isStreaming`` for clarity). That one-definition-two-modes
property is the point: the catalog oracle-checks these functions in
batch mode at sf0.01, and the streaming tests run the very same
functions over a file-source stream, so the streaming path computes
oracle-verified semantics.

Scale notes: windowed streaming aggregation keeps per-window state in
the state store; the watermark bounds that state (late rows beyond it
are dropped, closed windows are evicted). Sliding windows multiply
state by ``width/slide``; session windows keep one merging state per
key. All aggregation is hash-based with partial aggregation before the
shuffle on (window, key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_stats(
    df: DataFrame,
    window: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Count + sum per (tumbling window, key)."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"), key_col, "n_events", "sum_value"
        )
    )


def sliding_counts(
    df: DataFrame,
    width: str = "2 days",
    slide: str = "1 day",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Count + sum per sliding window (each event lands in
    ``width/slide`` windows — Spark's Expand handles the fan-out
    map-side, before partial aggregation)."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n_events", "sum_value")
    )


def interval_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    lookback: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: each ``left_type`` event
    paired with the same key's ``right_type`` events in the preceding
    ``lookback``. On streams both sides carry watermarks and the range
    condition bounds the join state (rows older than
    watermark+lookback are evicted); on batch it is a plain equi+range
    join. Returns (key, left event_id, left ts, right ts).

    ``how='left_outer'`` keeps left events with NO in-window partner
    (null ``r_ts``) — the "purchase without a preceding click"
    attribution gap. Stream note: outer rows are emitted only once the
    watermark passes their interval (the engine must prove no partner
    can still arrive), so an outer streaming query trails the inner
    one by the watermark delay — the event-time range condition here
    is exactly what makes outer stream-stream joins legal in Spark."""
    left = events.where(F.col("event_type") == left_type).select(
        key_col, "event_id", F.col(ts_col).alias("l_ts")
    )
    right = events.where(F.col("event_type") == right_type).select(
        F.col(key_col).alias("__rk"), F.col(ts_col).alias("r_ts")
    )
    if events.isStreaming:
        left = left.withWatermark("l_ts", watermark)
        right = right.withWatermark("r_ts", watermark)
    cond = (
        (F.col(key_col) == F.col("__rk"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    return left.join(right, cond, how).select(
        key_col, "event_id", "l_ts", "r_ts"
    )


def dedup_events(
    df: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once event dedup: drop repeats of ``keys``
    within the watermark horizon (at-least-once sources -> exactly-once
    downstream). State holds one entry per key and is evicted once the
    watermark passes — include ``ts_col`` in the contract so eviction
    is safe. Works identically on batch frames (plain dropDuplicates).
    """
    d = _maybe_watermark(df, ts_col, watermark)
    if df.isStreaming:
        return d.dropDuplicatesWithinWatermark(list(keys))
    return d.dropDuplicates(list(keys))


def session_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows: events of one key belong to one session while
    each is within ``gap`` of the session's current end (Spark merges
    adjacent windows; the batch-SQL equivalent is gaps-and-islands
    over ``lag(ts)``)."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )

"""Product-analytics operators (north-star extension): ordered funnel
conversion and cohort retention — the two queries every event store
answers, expressed in shapes that hold at 100 TB of events.

Funnel: the naive formulation is K self-joins (step k joined to step
k-1 on user + later-timestamp) — K shuffles of raw events and a range
predicate each. Here the ORDER is resolved by running-minimum window
columns over ONE (user, ts) sort: a step-k event qualifies iff some
qualifying step-(k-1) event sorts strictly before it. All window
layers share the same partitioning/ordering, so Catalyst plans one
exchange + one sort for the whole funnel, then a single partial
aggregate reduces to per-step user counts. No self-join, no range
join, no event ever leaves its user's partition.

Retention: two aggregates (per-user cohort anchor; per-(user, week)
activity) joined on user — both cluster on user_id, the activity
frame is already collapsed to one row per (user, week) before the
join, and the final count shuffles (cohort_week, week_offset) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel: one row per step with the number of users who
    completed the funnel prefix ending at that step (step k counts
    users with events s_1 < s_2 < ... < s_k in strict (ts, tie)
    order). Returns (step_index, step, n_users), step_index 1-based.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events
    qual_flags = []
    for i, step in enumerate(steps):
        flag = f"__q{i}"
        if i == 0:
            df = df.withColumn(
                flag, F.col(type_col) == F.lit(step)
            )
        else:
            prev_seen = F.min(
                F.when(F.col(f"__q{i-1}"), F.col(ts_col))
            ).over(w)
            df = df.withColumn(
                flag,
                (F.col(type_col) == F.lit(step)) & prev_seen.isNotNull(),
            )
        qual_flags.append(flag)
    per_user = df.groupBy(user_col).agg(
        *[
            F.max(F.col(f).cast("int")).alias(f"__r{i}")
            for i, f in enumerate(qual_flags)
        ]
    )
    counts = per_user.agg(
        *[F.sum(f"__r{i}").alias(f"__n{i}") for i in range(len(steps))]
    )
    rows = [
        f"struct({i + 1} AS step_index, '{s}' AS step, __n{i} AS n_users)"
        for i, s in enumerate(steps)
    ]
    return counts.selectExpr(
        f"inline(array({', '.join(rows)}))"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users anchored to the week of their
    first event; one row per (cohort_week, week_offset) with the
    number of cohort users active that week. week_offset 0 is the
    cohort week itself (always the full cohort size)."""
    week = F.date_trunc("WEEK", F.col(ts_col))
    anchors = events.groupBy(user_col).agg(
        F.date_trunc("WEEK", F.min(ts_col)).alias("cohort_week")
    )
    activity = (
        events.select(user_col, week.alias("week"))
        .groupBy(user_col, "week")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    joined = activity.join(anchors, user_col)
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
        / 604800
    ).cast("bigint")
    return (
        joined.select("cohort_week", offset.alias("week_offset"), F.col(user_col))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )

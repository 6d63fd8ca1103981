"""Range joins over a numeric axis: binned interval-point and
interval-interval joins, plus a sweep-line concurrency operator.

The reference engine family stops at equality and as-of joins
(``operators/temporal.py``); range predicates are the remaining
temporal-join shape a training-data pipeline needs (validity windows,
promo periods, outage overlap). Spark's naive formulation —
``a JOIN b ON a.s <= b.x AND b.x <= a.e`` with no equality conjunct —
compiles to BroadcastNestedLoopJoin (or a cartesian product when both
sides are large): O(|A| x |B|) comparisons, the canonical 100 TB job
killer. DuckDB special-cases this with an IEJoin operator; Spark has
no equivalent, so we make the planner's OWN hash join do the work:

* BINNING — quantize the axis into fixed-width bins. An interval is
  emitted once per bin it touches (``explode(sequence(...))``, a
  blowup of at most ``1 + ceil(len / bin_width)``, <= 2 when
  ``bin_width >= max interval length``); a point lands in exactly ONE
  bin. Joining on the bin id (plus any equality keys) is then an
  ordinary shuffled/broadcast HASH join — candidate pairs only where
  bins collide — and the exact predicate runs as a cheap post-join
  filter. Same pigeonhole shape as the LSH band join in
  ``multimodal.probe_signature_pairs``, applied to 1-D geometry.

* PAIR UNIQUENESS, NOT ``distinct()`` — an interval-interval pair can
  share several bins, but two intervals overlap iff both contain
  ``max(s1, s2)``, and that coordinate lies in exactly one bin. Keep
  a candidate only in THAT bin and every overlapping pair survives
  exactly once: a row-local filter replaces a full-result shuffle
  dedup.

* SWEEP-LINE — for "how many intervals are active at once" the join
  is not needed at all: aggregate +1/-1 boundary deltas per axis
  value and take a running sum per key. Two narrow shuffles (one
  hash, one window sort) on O(2 x |intervals|) rows, versus the
  quadratic self-join a pair-count formulation implies.

Axis convention: any integral column (epoch days here; works for any
unit). Intervals are CLOSED on both ends — ``[s, e]`` matches ``x``
iff ``s <= x <= e`` — mirroring SQL ``BETWEEN`` so DuckDB oracles are
word-for-word comparable.

Picking ``bin_width`` at scale: the blowup factor is
``1 + len/bin_width`` (storage) while candidate density per bin grows
with ``bin_width`` (compute) — set it near the TYPICAL interval
length so both stay O(1); a long-tail of huge intervals is better
served by splitting them into a broadcast side-channel than by
inflating every bin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bin_of(col: Column, bin_width: int) -> Column:
    """Bin id of an axis coordinate: ``floor(x / w)`` as LONG —
    floor-division semantics hold for negative coordinates too."""
    return F.floor(col / F.lit(bin_width)).cast("long")


def explode_interval_bins(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bin_width: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """One output row per (interval, touched bin): the build side of
    every binned range join. ``sequence`` is evaluated JVM-side inside
    whole-stage codegen; no Python boundary."""
    return df.withColumn(
        bin_col,
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), bin_width),
                _bin_of(F.col(end_col), bin_width),
            )
        ),
    )


def range_join_point(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner join of ``points`` to every interval CONTAINING the point
    (``start <= x <= end``), optionally within equality keys ``on`` —
    as an equi hash join on (keys..., bin id), never a nested-loop.

    A point lives in exactly one bin and an interval is present in
    every bin it touches, so each (point, containing-interval) pair
    meets exactly once: no post-join dedup. Non-key column names must
    be disjoint between the two inputs (select/alias first).
    """
    on = list(on)
    ivb = explode_interval_bins(
        intervals, start_col, end_col, bin_width, "__bin"
    )
    pts = points.withColumn("__bin", _bin_of(F.col(point_col), bin_width))
    return (
        pts.join(ivb, on=on + ["__bin"])
        .where(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )


def range_join_intervals(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bin_width: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner join of interval pairs that OVERLAP (``s1 <= e2 AND
    s2 <= e1``, closed ends), optionally within equality keys ``on``,
    as an equi hash join on (keys..., bin id).

    Each overlapping pair is emitted EXACTLY once without a
    ``distinct()``: the pair is kept only in the bin containing
    ``greatest(s1, s2)`` — the overlap's first coordinate, which both
    intervals contain and which lies in exactly one bin. Bound column
    names must be disjoint between the sides (alias first).
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    on = list(on)
    lb = explode_interval_bins(left, ls, le, bin_width, "__bin")
    rb = explode_interval_bins(right, rs, re_, bin_width, "__bin")
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    anchor = _bin_of(F.greatest(F.col(ls), F.col(rs)), bin_width)
    return (
        lb.join(rb, on=on + ["__bin"])
        .where(overlap & (anchor == F.col("__bin")))
        .drop("__bin")
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    axis_col: str = "axis",
    out_col: str = "concurrent",
) -> DataFrame:
    """Sweep-line concurrency: for every axis value where the count
    changes, the number of intervals active there (closed ends:
    active on ``[s, e]``). One row per (keys, breakpoint); the value
    holds until the next breakpoint.

    Shape: union of +1 deltas at ``s`` and -1 deltas at ``e + 1``,
    pre-aggregated per (keys, axis) — the map-side combine collapses
    coincident boundaries BEFORE the shuffle — then one running-sum
    window per key. Linear in the interval count; the quadratic
    pair-join never exists.
    """
    on = list(on)
    starts = df.select(
        *on, F.col(start_col).alias(axis_col), F.lit(1).alias("__d")
    )
    ends = df.select(
        *on, (F.col(end_col) + 1).alias(axis_col), F.lit(-1).alias("__d")
    )
    deltas = (
        starts.unionByName(ends)
        .groupBy(*on, axis_col)
        .agg(F.sum("__d").alias("__d"))
    )
    w = Window.partitionBy(*on).orderBy(axis_col)
    return (
        deltas.withColumn(out_col, F.sum("__d").over(w).cast("long"))
        .drop("__d")
    )

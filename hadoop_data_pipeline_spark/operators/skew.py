"""Skew mitigation: salting (SURVEY.md §7.2 step 9).

AQE's skew-join splitting (on in session.py) handles most hot keys at
runtime by splitting oversized shuffle partitions. Salting is the
explicit fallback for the cases AQE can't fix:

* a single group whose AGGREGATION state is too hot (everything for
  key K lands on one task) -> two-stage salted aggregate;
* a shuffle join where one key dominates and the small side fits
  replication -> salted join (small side replicated per salt, large
  side salted deterministically).

Both transforms are pure plan rewrites — results are identical to the
unsalted form (tests assert equality), only the key space is widened
``salt_buckets``-fold during the hot stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Decomposable aggregates: partial(stage 1) -> combine(stage 2).
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _salt_col(df: DataFrame, salt_buckets: int) -> Column:
    """Deterministic per-row salt: hash of the whole row modulo the
    bucket count (stable across retries — rand() would break retry
    idempotency in a shuffle-file loss scenario)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot groups.

    ``aggs`` maps output column -> (function, input column) with
    function in {sum, count, min, max}. Stage 1 aggregates on
    (keys + salt) — the hot group fans out over ``salt_buckets``
    tasks; stage 2 combines the tiny per-salt partials on ``keys``.
    """
    unknown = {f for f, _ in aggs.values()} - set(_COMBINE)
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(unknown)}")
    salted = df.withColumn("__salt", _salt_col(df, salt_buckets))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _COMBINE[fn](out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot side's key space widened by a salt.

    The large side gets a deterministic salt in [0, salt_buckets); the
    small side is replicated once per salt value (explode of a
    sequence — cost: |small| * salt_buckets rows, acceptable when
    ``small`` is small but above the broadcast threshold). The join
    key becomes (on..., salt), so one hot key spreads over
    ``salt_buckets`` shuffle partitions. Result set is identical to
    the plain join.
    """
    on = list(on)
    salted_large = large.withColumn("__salt", _salt_col(large, salt_buckets))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_large.join(replicated_small, [*on, "__salt"], how)
    return out.drop("__salt")

"""Reshaping operators (SURVEY.md §2.4).

R1 unpivot (wide->long) is the reference's signature operator: it turns
the 35-column wide budget table into the long EAV serving table via a
``stack(...)`` expression over the 32 measure columns (reference
``jobs/finance_itsc_pipeline.py:107-113``). Here it is the native
``DataFrame.unpivot`` (Spark >= 3.4), which Catalyst expands to the
same Expand node — a narrow, shuffle-free transformation: each input
row fans out to N output rows within its partition, so it scales
linearly with input and never reshuffles.

R2 pivot (long->wide) is the inverse; Spark's ``pivot`` needs the value
list to avoid a pre-pass collecting distinct keys — callers at scale
should pass ``values`` explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str] | None = None,
    var_name: str = "category",
    value_name: str = "amount",
    drop_nulls: bool = True,
) -> DataFrame:
    """Wide -> long (R1). ``values`` defaults to all non-id columns.

    Mirrors the reference's stack-unpivot including the trailing
    drop-null-amounts filter (``jobs/finance_itsc_pipeline.py:113``).
    Mixed numeric types are cast to double first (unpivot requires a
    common value type).
    """
    ids = list(ids)
    if values is None:
        values = [c for c in df.columns if c not in ids]
    values = list(values)
    casted = df.select(
        *[F.col(c) for c in ids], *[F.col(c).cast("double").alias(c) for c in values]
    )
    long_df = casted.unpivot(ids, values, var_name, value_name)
    if drop_nulls:
        long_df = long_df.where(F.col(value_name).isNotNull())
    return long_df


def pivot(
    df: DataFrame,
    ids: Sequence[str],
    var_col: str = "category",
    value_col: str = "amount",
    values: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Long -> wide (R2), inverse of :func:`unpivot`.

    Pass ``values`` (the distinct categories) at scale to skip the
    distinct-collect pre-pass; one shuffle on ``ids`` either way.
    """
    agg_fn = getattr(F, agg)
    grouped = df.groupBy(*ids)
    p = grouped.pivot(var_col, list(values)) if values is not None else grouped.pivot(var_col)
    return p.agg(agg_fn(F.col(value_col)))


def repartition_for_write(df: DataFrame, *cols: str) -> DataFrame:
    """R3: align in-memory partitioning with the write partition columns
    so each output partition directory is written by few tasks (avoids
    the small-files problem; AQE then coalesces tiny shuffle splits)."""
    return df.repartition(*[F.col(c) for c in cols])

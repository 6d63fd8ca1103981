"""Driver contract for the PySpark engine.

``entry(spark)`` — flagship query (J1 latest-per-group) at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column-name discipline: every computed/aggregate column is aliased
identically in the Spark code and the oracle SQL (the driver sorts
columns by name before hashing). Floating-point aggregates are rounded
to a fixed number of decimals on BOTH sides so accumulation-order
differences between Spark's partial aggregation and DuckDB's do not
flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_data_pipeline_spark import queries_catalog

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest event per (user_id, event_type) — the reference's
    'latest remaining balance per category' semantic (SURVEY.md §2.6 J1)
    transplanted onto the events fixture."""
    return queries_catalog.QUERIES["latest_event_per_user_type"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_catalog.ORACLES)


def bound_oracle_sql() -> dict[str, dict]:
    """OPTIONAL extension the external driver ignores: tolerance
    oracles for sketch-valued queries (exact ground-truth SQL + the
    relative error bound the estimate must stay within). Enforced by
    `tools/oracle_check.py` and the pre-commit gate."""
    return dict(queries_catalog.BOUND_ORACLES)

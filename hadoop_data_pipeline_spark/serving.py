"""Dashboard serving queries (SURVEY.md §2.5 A3/A4/A6, §2.6 J1, §3.3).

The reference's sidebar statistics over the long table
(``dashboard/components/sidebar.py:8-65``), as DataFrame functions on
a finance-long-shaped frame (date, details, year, category, amount).

Scale notes: every function filters on the ``year`` partition column
first (partition pruning — only one year's files are scanned).
``negative_latest_categories`` uses the window form of J1 rather than
the reference's MAX(date) self-join: one shuffle on ``category``
instead of an aggregate + join, and no second scan of the long table.
The results are bounded (per-category / per-year), safe to collect for
a dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALL_YEAR_BUDGET = "all-year-budget"


def available_years(long_df: DataFrame) -> DataFrame:
    """A6: DISTINCT year ORDER BY year DESC."""
    return long_df.select("year").distinct().orderBy(F.desc("year"))


def quick_stats(long_df: DataFrame, year: int) -> DataFrame:
    """A3: total budget (the all-year-budget row) vs total spent for
    one year, plus derived remaining and pct_used — one aggregate pass
    with conditional sums instead of the reference's two queries."""
    d = long_df.where(F.col("year") == year)
    out = d.agg(
        F.sum(
            F.when(
                (F.col("details") == "budget")
                & (F.col("date") == ALL_YEAR_BUDGET),
                F.col("amount"),
            )
        ).alias("total_budget"),
        F.sum(F.when(F.col("details") == "spent", F.col("amount"))).alias(
            "total_spent"
        ),
    )
    return out.select(
        F.coalesce("total_budget", F.lit(0.0)).alias("total_budget"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
        (
            F.coalesce("total_budget", F.lit(0.0))
            - F.coalesce("total_spent", F.lit(0.0))
        ).alias("remaining"),
        F.when(
            F.coalesce("total_budget", F.lit(0.0)) != 0,
            F.round(
                F.coalesce("total_spent", F.lit(0.0))
                / F.col("total_budget") * 100,
                2,
            ),
        ).otherwise(F.lit(0.0)).alias("pct_used"),
    )


def latest_remaining_per_category(long_df: DataFrame, year: int) -> DataFrame:
    """J1 core: the latest ``remaining`` balance per category for one
    year (window argmax; MAX(date) works because YYYY-MM sorts
    lexicographically — sentinel rows are excluded by the rlike guard,
    SURVEY.md §7.4)."""
    w = Window.partitionBy("category").orderBy(F.desc("date"))
    return (
        long_df.where(
            (F.col("year") == year)
            & (F.col("details") == "remaining")
            & F.col("date").rlike(r"^\d{4}-\d{2}$")
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("category", "date", "amount")
    )


def negative_latest_categories(long_df: DataFrame, year: int) -> DataFrame:
    """A4+J1: categories whose latest remaining balance is negative,
    worst first (reference ``sidebar.py:40-65``)."""
    return (
        latest_remaining_per_category(long_df, year)
        .where(F.col("amount") < 0)
        .select("category", "amount")
        .orderBy(F.asc("amount"))
    )

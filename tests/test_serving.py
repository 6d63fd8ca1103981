"""Serving-layer stats (reference sidebar contract, SURVEY.md §3.3)."""

from __future__ import annotations

import pytest

from hadoop_data_pipeline_spark import serving

ROWS = [
    # year 2024
    ("all-year-budget", "budget", 2024, "cat_a", 100.0),
    ("all-year-budget", "budget", 2024, "cat_b", 50.0),
    ("2024-01", "spent", 2024, "cat_a", 30.0),
    ("2024-02", "spent", 2024, "cat_b", 20.0),
    ("2024-01", "remaining", 2024, "cat_a", 70.0),
    ("2024-02", "remaining", 2024, "cat_a", 60.0),   # latest for cat_a
    ("2024-01", "remaining", 2024, "cat_b", 10.0),
    ("2024-02", "remaining", 2024, "cat_b", -5.0),   # latest, negative
    ("2024-01", "remaining", 2024, "cat_c", -1.0),
    ("2024-02", "remaining", 2024, "cat_c", -8.0),   # latest, negative, worst
    ("remaining", "remaining", 2024, "cat_a", 999.0),  # sentinel: excluded
    # year 2023
    ("all-year-budget", "budget", 2023, "cat_a", 10.0),
    ("2023-03", "remaining", 2023, "cat_a", 4.0),
]


@pytest.fixture()
def long_df(spark):
    return spark.createDataFrame(
        ROWS, "date string, details string, year int, category string, amount double"
    )


def test_available_years_desc(long_df):
    assert [r["year"] for r in serving.available_years(long_df).collect()] == [
        2024, 2023,
    ]


def test_quick_stats(long_df):
    row = serving.quick_stats(long_df, 2024).collect()[0]
    assert row["total_budget"] == 150.0
    assert row["total_spent"] == 50.0
    assert row["remaining"] == 100.0
    assert row["pct_used"] == pytest.approx(33.33)


def test_quick_stats_empty_year(long_df):
    row = serving.quick_stats(long_df, 1999).collect()[0]
    assert (row["total_budget"], row["total_spent"], row["pct_used"]) == (0.0, 0.0, 0.0)


def test_latest_remaining_excludes_sentinels(long_df):
    got = {
        r["category"]: (r["date"], r["amount"])
        for r in serving.latest_remaining_per_category(long_df, 2024).collect()
    }
    assert got == {
        "cat_a": ("2024-02", 60.0),
        "cat_b": ("2024-02", -5.0),
        "cat_c": ("2024-02", -8.0),
    }


def test_negative_latest_categories_worst_first(long_df):
    got = [
        (r["category"], r["amount"])
        for r in serving.negative_latest_categories(long_df, 2024).collect()
    ]
    assert got == [("cat_c", -8.0), ("cat_b", -5.0)]

"""End-to-end medallion integration (reference test_manual.sh parity,
SURVEY.md §5): raw CSVs -> DQ gate -> atomic wide -> long -> snapshot
-> serving stats -> restore, in one flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_data_pipeline_spark import serving
from hadoop_data_pipeline_spark.pipeline import IncrementalPipeline

WIDE_COLS = ["date", "total_amount", "details", "m1", "m2", "m3"]


def _rows_for_year(year: int, budget: float):
    rows = [("all-year-budget", budget, "budget", budget / 3, budget / 3, budget / 3)]
    remaining = budget
    for m in range(1, 4):
        spent = budget / 10
        rows.append((f"{year}-0{m}", spent, "spent", spent / 3, spent / 3, spent / 3))
        remaining -= spent
        rows.append(
            (f"{year}-0{m}", remaining, "remaining",
             remaining / 3, remaining / 3, remaining / 3)
        )
    rows.append(("total spent", 3 * budget / 10, "spent", 0.1, 0.1, 0.1))
    rows.append(("remaining", remaining, "remaining", 0.1, 0.1, 0.1))
    return rows


def _write_year(tmp_path, year, budget):
    d = tmp_path / "raw" / f"year={year}"
    d.mkdir(parents=True, exist_ok=True)
    (d / f"finance_{year}.csv").write_text(
        "date,total_amount,details,m1,m2,m3\n"
        + "\n".join(",".join(str(v) for v in r) for r in _rows_for_year(year, budget))
    )


def test_medallion_flow_to_serving_and_restore(spark, tmp_path):
    _write_year(tmp_path, 2023, 90.0)
    _write_year(tmp_path, 2024, 120.0)
    p = IncrementalPipeline(
        spark,
        raw_root=str(tmp_path / "raw"),
        wide_path=str(tmp_path / "staging"),
        long_path=str(tmp_path / "curated"),
        versions_root=str(tmp_path / "versions"),
        expected_columns=WIDE_COLS,
    )
    result = p.run()
    assert result.processed == [2023, 2024]
    assert all(y.report.passed for y in result.years)

    # Serving layer over the curated long zone (partition discovery).
    long_df = spark.read.option("basePath", str(tmp_path / "curated")).parquet(
        str(tmp_path / "curated/year=*")
    )
    assert [r["year"] for r in serving.available_years(long_df).collect()] == [
        2024, 2023,
    ]
    stats = serving.quick_stats(long_df, 2024).collect()[0]
    assert stats["total_budget"] == 120.0
    assert round(stats["total_spent"], 6) == 36.0
    assert round(stats["pct_used"], 2) == 30.0
    latest = serving.latest_remaining_per_category(long_df, 2024).collect()
    # 3 categories, each latest at month 03 with remaining 84/3 each.
    assert len(latest) == 3
    assert all(r["date"] == "2024-03" and round(r["amount"], 6) == 28.0 for r in latest)
    assert serving.negative_latest_categories(long_df, 2024).count() == 0

    # Snapshot restore round-trip: corrupt the wide zone, restore v1.
    vid = result.years[1].version_id
    assert vid is not None
    spark.createDataFrame([("broken", 0.0, "spent", 0.0, 0.0, 0.0)],
                          "date string, total_amount double, details string, "
                          "m1 double, m2 double, m3 double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "staging/year=2024"))
    p.versioner.restore_version(vid, 2024, str(tmp_path / "staging"))
    restored = spark.read.parquet(str(tmp_path / "staging/year=2024"))
    assert restored.count() == 9
    assert restored.where(F.col("date") == "all-year-budget").count() == 1


def test_cli_entry_sensor_run_notify(spark, tmp_path, capsys):
    # C7: the spark-submit/cron entry point — sensor mode detects
    # pending input, a run emits a JSON summary and exits 0, re-run is
    # an idempotent no-op (markers), sensor then reports nothing left.
    import json

    from hadoop_data_pipeline_spark import pipeline as pl

    _write_year(tmp_path, 2025, 60.0)
    argv_common = [
        "--raw-root", str(tmp_path / "raw"),
        "--wide-path", str(tmp_path / "wide"),
        "--long-path", str(tmp_path / "curated"),
        "--expected-columns", ",".join(WIDE_COLS),
    ]
    assert pl.main(["--check-only", *argv_common]) == 0  # pending exists
    capsys.readouterr()

    assert pl.main(argv_common) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["years"][0]["year"] == 2025
    assert summary["years"][0]["passed"] is True
    assert summary["years"][0]["long_rows"] > 0

    # idempotent: nothing pending, sensor exits 1, run processes zero
    assert pl.main(["--check-only", *argv_common]) == 1
    capsys.readouterr()
    assert pl.main(argv_common) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "years": []
    }

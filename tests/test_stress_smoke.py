"""The stress harness (tools/stress.py) is gate stage 4 — this smoke
keeps its machinery (key-shifted build, skew remap, DuckDB view glob,
compare loop) from bit-rotting between gate runs, on sf0.001 so it
stays cheap inside pytest."""

from __future__ import annotations

import duckdb

from tools import stress
from tools.oracle_check import TABLES, compare

SMOKE_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "quantity_price_correlation",
    "bom_rollup_recursive",
    "rolling_1h_user_event_stats",
]


def test_stress_build_and_compare_smoke(spark, tmp_path):
    import __spark_entry__ as e

    out = str(tmp_path / "stress")
    stress.build(spark, "/root/testdata/sf0.001", out, copies=2)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM parquet_scan('{out}/{t}.parquet/*.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    for name in SMOKE_QUERIES:
        sdf = qs[name](spark, out).toPandas()
        ddf = con.execute(oracles[name]).df()
        assert not compare(sdf, ddf), name
    # the doubled copy really doubled the data
    n = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    base = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).count()
    assert n == 2 * base


def test_stress_headline_is_inclusive_by_default():
    """Every catalog query with an exact or bound oracle is in the
    stress sweep unless explicitly excluded with a reason — a new
    query cannot silently skip scale coverage."""
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    bounds = e.bound_oracle_sql()
    headline = set(stress.stress_headline(qs, oracles, bounds))
    oracle_able = {n for n in qs if n in oracles or n in bounds}
    assert headline == oracle_able - set(stress.STRESS_EXCLUDE)
    # exclusions must name real queries and carry a reason
    for name, reason in stress.STRESS_EXCLUDE.items():
        assert name in qs, f"stale exclusion: {name}"
        assert len(reason) > 10
    # and the sweep is wide: >= 100 queries (VERDICT r5 item 5)
    assert len(headline) >= 100


def test_spark_only_laws_account_for_every_exclusion():
    """Loud-accounting contract of the spark-only sweep: every
    STRESS_EXCLUDE entry must have a structural law AND exist in the
    catalog (the sweep FAILs either gap at runtime; this pins it at
    test time so the gate never gets the chance), and every law's
    callable accepts (n_K, n_1, K)."""
    import __spark_entry__ as e

    qs = e.queries()
    assert set(stress.STRESS_EXCLUDE) == set(stress.SPARK_ONLY_LAWS)
    for name in stress.STRESS_EXCLUDE:
        assert name in qs, f"stale exclusion: {name}"
    for name, (desc, law) in stress.SPARK_ONLY_LAWS.items():
        assert len(desc) > 10, name
        assert law(4, 2, 2) in (True, False), name  # callable, boolean


def test_spark_only_sweep_fails_loudly_on_gaps(spark, tmp_path, monkeypatch):
    """A renamed/removed excluded query or a law-less exclusion is a
    FAILURE with its own FAIL line, never a silent skip counted as
    passed."""
    import __spark_entry__ as e

    qs = e.queries()
    monkeypatch.setattr(
        stress,
        "STRESS_EXCLUDE",
        {"ghost_query": "renamed away", "embedding_cosine_topk": "x"},
    )
    monkeypatch.setattr(
        stress,
        "SPARK_ONLY_LAWS",
        {"ghost_query": ("n/a", lambda nK, n1, K: True)},
    )
    failed = stress.spark_only_sweep(
        spark, qs, "/root/testdata/sf0.001", str(tmp_path / "nope"), 2
    )
    assert set(failed) == {"ghost_query", "embedding_cosine_topk"}


def test_compact_sink_stores_rejects_unknown_store(spark, tmp_path):
    from hadoop_data_pipeline_spark.streaming.commitlog import BatchCommitLog
    from hadoop_data_pipeline_spark.streaming.maintenance import (
        compact_sink_stores,
    )
    import pytest

    s = tmp_path / "s"
    s.mkdir()
    log = BatchCommitLog(str(tmp_path / "log"), {"s": str(s)})
    with pytest.raises(ValueError, match="not registered"):
        compact_sink_stores(spark, log, stores=["typo"])
    # empty registered store: 0, lease released
    assert compact_sink_stores(spark, log) == {"s": 0}
    assert not (tmp_path / "log" / "writer.lock").exists()


def test_stress_skew_remap(spark, tmp_path):
    out = str(tmp_path / "stress_skew")
    stress.build(
        spark, "/root/testdata/sf0.001", out, copies=2, skew=True
    )
    ev = spark.read.parquet(f"{out}/events.parquet")
    total = ev.count()
    hot = ev.where(f"user_id = {stress.HOT_USER}").count()
    assert 0.25 * total < hot < 0.40 * total

"""Scale-stress correctness: run headline queries at ~4x sf0.1
(~2.4M lineitem rows) against DuckDB.

The driver fixtures stop at sf0.1; bugs that only show above that
(float accumulation order, boundary thresholds, window frames over
bigger groups) need bigger data. This tool materializes a key-shifted
union of K copies of sf0.1 — every copy's keys are offset by a stride
so referential integrity holds and group counts grow K-fold — then
runs a headline subset through BOTH engines and value-compares, the
same check as tools/oracle_check.py, at a scale the fixtures don't
ship.

Timestamps are shifted per copy (+i hours) so event-time windows and
gap statistics see genuinely new data, not K identical cohorts.

Usage: python tools/stress.py [copies] [sf_dir] [--skew]
Writes the derived parquet under /tmp/spark_graft_stress (re-created
each run), never under /root/testdata.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

KEY_STRIDE = 10_000_000  # far above any sf0.1 key

#: table -> (key columns to offset, timestamp columns to shift)
SHIFTS = {
    "region": ([], []),
    "nation": ([], []),
    "customer": (["c_custkey"], []),
    "supplier": (["s_suppkey"], []),
    "part": (["p_partkey"], []),
    "orders": (["o_orderkey", "o_custkey"], ["o_orderdate"]),
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey"],
        ["l_shipdate"],
    ),
    "events": (["event_id", "user_id"], ["ts"]),
    "documents": (["doc_id"], []),
    "embeddings": (["vec_id"], []),
}

#: headline subset: joins+agg, exact-cents agg, windows (ROWS/RANGE),
#: threshold boundary, dedup, recursive CTE, profile — plus every
#: query whose oracle rounds a FLOAT aggregate over a COARSE group
#: (nation / day / flag / event_type): key-shifted copies keep
#: per-entity groups constant but grow coarse groups K-fold, which is
#: exactly where accumulation-order wobble outgrows round(..., 2).
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "profit_by_nation_year",
    "latest_event_per_user_type",
    "rolling_1h_user_event_stats",
    "user_event_gap_stats_window",
    "dominant_supplier_share",
    "dedup_exact_docs",
    "bom_rollup_recursive",
    "profile_lineitem_columns",
    "event_type_transitions",
    "quantity_price_correlation",
    # coarse-group float aggregates / float thresholds
    "case_when_agg_per_user",
    "filtered_sum_returned_revenue",
    "forecast_revenue_change",
    "promo_revenue_share",
    "nation_market_share",
    "nation_pair_trade_volume",
    "monthly_revenue_moving_avg",
    "daily_revenue_anomalies",
    "tumbling_daily_event_stats",
    "sliding_2d_event_counts",
    "rollup_revenue",
    "cube_returnflag_linestatus",
    "grouping_sets_revenue",
    "salted_event_type_stats",
    "top_supplier_revenue",
    "part_revenue_concentration",
    "small_quantity_part_revenue",
    "idle_rich_customers",
    "shipping_priority_top10",
    "top_returning_customers",
    "incremental_daily_agg_merge",
    "median_price_by_segment",
    "customer_spend_decile_by_nation",
    "event_value_histogram",
    "ship_latency_priority_counts",
    # cheap row-local / window / kernel coverage (quadratic-oracle
    # text-pair queries stay out — THEIR DuckDB oracles, not the
    # Spark plans, are what cannot take 8x)
    "text_token_stats",
    "doc_fingerprint",
    "minhash_signatures_docs",
    "media_frame_digests",
    "user_journey_paths",
    "user_first_last_events",
    "supplier_balance_percentile",
    "running_sum_per_user",
    "forward_fill_purchase_value",
    "top3_orders_per_customer",
    # dedup family with index-based oracles (cluster resolution's
    # recursive-CTE oracle costs ~200s at 8x — Spark side is covered
    # via the pair queries; the quadratic simhash oracle stays out)
    "near_dup_pairs_minhash",
    "incremental_near_dup_new_docs",
    "segment_dedup_docs",
    "ngram_jaccard_pairs_lang",  # K identical copies push every
    # shingle past the df cap -> both engines must agree on the
    # now-empty pair set (the cap is part of the semantics)
]


#: --skew: queries whose plans key on user_id — the dimension the hot
#: key attacks (windows cannot be split by AQE; aggregates rely on
#: partial combine / salting).
SKEW_HEADLINE = [
    "latest_event_per_user_type",
    "rolling_1h_user_event_stats",
    "user_event_gap_stats_window",
    "running_sum_per_user",
    "forward_fill_purchase_value",
    "user_first_last_events",
    "user_journey_paths",
    "event_type_transitions",
    "salted_event_type_stats",
    "tumbling_daily_event_stats",
    "session_window_user_stats",
    "case_when_agg_per_user",
]

#: Deterministic hot key: ~30% of all events collapse onto this user.
HOT_USER = 42


def build(
    spark, sf_dir: str, out_dir: str, copies: int, skew: bool = False
) -> None:
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.sources.readers import load_table

    shutil.rmtree(out_dir, ignore_errors=True)
    for table, (key_cols, ts_cols) in SHIFTS.items():
        base = load_table(spark, sf_dir, table)
        # a table with no shiftable key is a SHARED dimension
        # (region/nation): one copy, or its primary keys would
        # duplicate K-fold and every join through it would fan out
        # K^2 — breaking the "referential integrity holds, groups
        # grow K-fold" model this tool exists to enforce.
        n_copies = copies if (key_cols or ts_cols) else 1
        parts = []
        for i in range(n_copies):
            df = base
            for c in key_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * KEY_STRIDE))
            for c in ts_cols:
                df = df.withColumn(
                    c, F.col(c) + F.expr(f"INTERVAL {i} HOURS")
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if skew and table == "events":
            # one user owns ~30% of the corpus — the hot-key shape a
            # uniform fixture can never produce. Deterministic remap
            # so both engines see the identical rows.
            out = out.withColumn(
                "user_id",
                F.when(
                    F.col("event_id") % 10 < 3, F.lit(HOT_USER)
                ).otherwise(F.col("user_id")),
            )
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv
    copies = int(args[0]) if args else 4
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    # per-process dir: a gate stress stage and a manual run must not
    # rmtree each other's in-flight data.
    out_dir = f"/tmp/spark_graft_stress-{os.getpid()}"

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from hadoop_data_pipeline_spark.session import get_session
    from tools.oracle_check import TABLES, compare

    spark = get_session("stress")
    t0 = time.perf_counter()
    build(spark, sf_dir, out_dir, copies, skew=skew)
    mode = " (30% hot-key skew)" if skew else ""
    print(
        f"built {copies}x {sf_dir}{mode} in {time.perf_counter() - t0:.0f}s"
    )

    con = duckdb.connect()
    for t in TABLES:
        # Spark writes a parquet DIRECTORY; DuckDB needs the file glob.
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM parquet_scan('{out_dir}/{t}.parquet/*.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    headline = SKEW_HEADLINE if skew else HEADLINE
    failed = []
    for name in headline:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, out_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
            problems = compare(sdf, ddf)
        except Exception as ex:  # noqa: BLE001
            problems = [f"raised {ex}"]
        dt = time.perf_counter() - t0
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"MATCH {name} ({dt:.1f}s): rows={len(sdf)}")
    print(f"\n{len(headline) - len(failed)}/{len(headline)} pass at ~{copies}x sf0.1{mode}")
    if not failed:
        shutil.rmtree(out_dir, ignore_errors=True)  # keep data on FAIL
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

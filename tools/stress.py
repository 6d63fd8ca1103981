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

Usage: python tools/stress.py [copies] [sf_dir] [query ...] [--skew]
       python tools/stress.py [copies] [sf_dir] --spark-only-excluded
       python tools/stress.py [copies] [sf_dir] --also-spark-only-excluded
The second form runs ONLY the Spark side of the STRESS_EXCLUDE
entries (whose DuckDB oracles are capped) and checks structural
row-count laws, schema stability, and key-range containment instead
of a value hash — so oracle caps never cap Spark coverage. The third
form appends that sweep to the normal oracle-compared run, reusing
the same built corpus (what the gate uses).
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

#: Queries EXCLUDED from the stress sweep, each with the reason. The
#: sweep itself is inclusive-by-default: every catalog query with an
#: exact or bound oracle runs at the stress scale unless listed here —
#: so a newly registered query gets scale coverage automatically. In
#: every case below it is the DUCKDB ORACLE (quadratic pair
#: enumeration / recursive-CTE cluster resolution over K-fold more
#: rows), never the Spark plan, that cannot take 8x; the Spark sides
#: stay covered via their companion pair/stat queries and pytest.
STRESS_EXCLUDE = {
    # recursive-CTE cluster-resolution oracles (~200s+ at 8x):
    "dedup_clusters_minhash": "CTE cluster oracle ~200s at 8x",
    "semantic_dedup_embeddings": "recursive-CTE cluster oracle",
    "clean_corpus": "contains near-dup clustering stage (CTE oracle)",
    "prepare_training_shards": (
        "chains the clean_corpus CTE oracle (recursive cluster walk) "
        "— same reason as clean_corpus; the split/pack tail stays "
        "stress-covered via pack_token_shards"
    ),
    # quadratic pair-enumeration oracles:
    "simhash_near_dup_pairs": "O(d^2) simhash pair oracle",
    # layout-dependent, not scale-dependent:
    "provenance_file_name": (
        "counts input FILES; the stress build writes multi-part "
        "directories (8 parts) where the fixtures are single files — "
        "a layout difference, not a scale bug"
    ),
    "embedding_cosine_topk": "O(n^2) brute-force cosine oracle",
    "embedding_ann_lsh_topk": "O(n^2) verification oracle",
    "embedding_near_dup_pairs": "O(n^2) cosine pair oracle",
    "fuzzy_name_pairs_part": "O(n^2) blocked-levenshtein oracle",
    "image_near_dup_phash": "O(n^2) dhash pair oracle",
    "audio_fingerprint_near_dup": "O(n^2) fingerprint pair oracle",
    "video_scene_near_dup": "O(n^2) per-frame dhash pair oracle",
}


#: Spark-side row-count LAWS for the STRESS_EXCLUDE entries: the
#: DuckDB oracle is capped (quadratic / recursive-CTE), but nothing
#: caps the SPARK plan — so at 16x the sweep still EXECUTES the Spark
#: side of every excluded query and asserts a bounded invariant
#: against its 1x row count, plus schema stability and key-range
#: containment. A scale-dependent Spark bug (overflow, band collision
#: blowup, lost partition) can then never hide behind an oracle cap
#: (VERDICT r9 "What's wrong #3"). Each law is STRUCTURAL — derived
#: from what the operator returns, not from a measured sample:
#:
#: * per-input-row outputs (cluster assignment per doc) scale exactly
#:   K-fold: n_K == K * n_1.
#: * survivor sets after exact/near dedup are K-invariant: every copy
#:   carries the SAME texts, the content digest collapses cross-copy
#:   duplicates to one survivor, so n_K == n_1.
#: * pair generators can only GAIN pairs with copies (each copy
#:   replays its in-copy pairs, cross-copy identical content adds
#:   more): n_K >= K * n_1.
#: * fixed-query top-k is bounded by construction: n_1 <= n_K <= |Q|*k
#:   (more candidates can only fill buckets up to k).
SPARK_ONLY_LAWS: dict[str, tuple[str, object]] = {
    "dedup_clusters_minhash": (
        "one row per doc: n_K == K*n_1",
        lambda nK, n1, K: nK == K * n1,
    ),
    "semantic_dedup_embeddings": (
        "one row per vec: n_K == K*n_1",
        lambda nK, n1, K: nK == K * n1,
    ),
    "clean_corpus": (
        "exact dedup collapses cross-copy twins: n_K == n_1",
        lambda nK, n1, K: nK == n1,
    ),
    "prepare_training_shards": (
        "shards over the K-invariant cleaned corpus: n_K == n_1",
        lambda nK, n1, K: nK == n1,
    ),
    "simhash_near_dup_pairs": (
        "pairs only grow with copies: n_K >= K*n_1",
        lambda nK, n1, K: nK >= K * n1,
    ),
    "provenance_file_name": (
        "per-file rows; multi-part stress layout: n_K >= n_1",
        lambda nK, n1, K: nK >= n1,
    ),
    "embedding_cosine_topk": (
        "fixed 10 queries x k=5 exactly: n_K == n_1 == 50",
        lambda nK, n1, K: nK == n1 == 50,
    ),
    "embedding_ann_lsh_topk": (
        "bucketed top-k monotone, capped: n_1 <= n_K <= 50",
        lambda nK, n1, K: n1 <= nK <= 50,
    ),
    "embedding_near_dup_pairs": (
        "pairs only grow with copies: n_K >= K*n_1",
        lambda nK, n1, K: nK >= K * n1,
    ),
    "fuzzy_name_pairs_part": (
        # entity-level matcher: pairs are over DISTINCT names, and the
        # stress copies replay the same name set — so the pair set is
        # K-invariant (the row-level form would scale; this is the
        # sub-second entity form the catalog ships).
        "distinct-name pairs are K-invariant: n_K == n_1",
        lambda nK, n1, K: nK == n1,
    ),
    "image_near_dup_phash": (
        # content-addressed render: every copy replays its in-copy
        # pairs and identical cross-copy images add more.
        "pairs only grow with copies: n_K >= K*n_1",
        lambda nK, n1, K: nK >= K * n1,
    ),
    "audio_fingerprint_near_dup": (
        # same content-addressed argument as the image pairs.
        "pairs only grow with copies: n_K >= K*n_1",
        lambda nK, n1, K: nK >= K * n1,
    ),
    "video_scene_near_dup": (
        # content-addressed render: copies replay their in-copy pair
        # set and identical cross-copy videos share all 4 scenes.
        "pairs only grow with copies: n_K >= K*n_1",
        lambda nK, n1, K: nK >= K * n1,
    ),
}

#: Numeric output columns that carry fixture keys — their stress-scale
#: values must stay inside [0, K*KEY_STRIDE): the build offsets every
#: key by i*KEY_STRIDE (i < K) and base keys are < 10^7 = KEY_STRIDE/1.
ID_RANGE_COLS = {
    "doc_id", "vec_id", "id_a", "id_b", "query_id", "cand_id",
    "p_partkey", "anchor_id", "survivor_id", "cluster_id", "event_id",
    "user_id", "o_orderkey", "c_custkey", "s_suppkey", "l_orderkey",
}


def spark_only_sweep(spark, qs: dict, sf_dir: str, out_dir: str, copies: int) -> list[str]:
    """Execute the Spark side of every STRESS_EXCLUDE query at the
    stress scale and check the structural laws above. Returns the list
    of failed query names; prints one MATCH/FAIL line each.

    Accounting is LOUD: an exclusion missing from the catalog (renamed
    query) or missing its law (new exclusion without scale coverage)
    is a FAILURE, not a silent skip — otherwise the summary could
    print all-green for queries that never ran, defeating the step's
    purpose (oracle caps must never cap Spark coverage)."""
    import pyspark.sql.functions as F

    failed = []
    for name in sorted(STRESS_EXCLUDE):
        if name not in qs:
            failed.append(name)
            print(
                f"FAIL  [spark-only] {name}: in STRESS_EXCLUDE but not "
                f"in the catalog — stale exclusion (renamed/removed "
                f"query?); fix STRESS_EXCLUDE"
            )
            continue
        if name not in SPARK_ONLY_LAWS:
            failed.append(name)
            print(
                f"FAIL  [spark-only] {name}: excluded from the oracle "
                f"sweep but has no SPARK_ONLY_LAWS entry — add a "
                f"structural law so its Spark side keeps scale coverage"
            )
            continue
        desc, law = SPARK_ONLY_LAWS[name]
        t0 = time.perf_counter()
        problems: list[str] = []
        try:
            base = qs[name](spark, sf_dir)
            schema1 = [
                (f.name, f.dataType.simpleString()) for f in base.schema.fields
            ]
            n1 = base.count()
            big = qs[name](spark, out_dir)
            schemaK = [
                (f.name, f.dataType.simpleString()) for f in big.schema.fields
            ]
            if schemaK != schema1:
                problems.append(f"schema drift: {schema1} -> {schemaK}")
            nK = big.count()
            if not law(nK, n1, copies):
                problems.append(
                    f"law '{desc}' violated: n_K={nK} n_1={n1} K={copies}"
                )
            id_cols = [
                f.name
                for f in big.schema.fields
                if f.name in ID_RANGE_COLS
                and f.dataType.simpleString() in ("bigint", "int", "long")
            ]
            if id_cols and nK > 0:
                aggs = []
                for c in id_cols:
                    aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
                row = big.agg(*aggs).collect()[0]
                hi = copies * KEY_STRIDE
                for c in id_cols:
                    mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
                    if mn is not None and not (0 <= mn and mx < hi):
                        problems.append(
                            f"key range {c}=[{mn},{mx}] outside [0,{hi})"
                        )
        except Exception as ex:  # noqa: BLE001
            problems = [f"raised {ex}"]
            nK = n1 = -1
        dt = time.perf_counter() - t0
        if problems:
            failed.append(name)
            print(f"FAIL  [spark-only] {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(
                f"MATCH [spark-only] {name} ({dt:.1f}s): "
                f"n_K={nK} n_1={n1} law ok ({desc})"
            )
    return failed


def stress_headline(qs: dict, oracles: dict, bounds: dict) -> list[str]:
    """All oracle-able catalog queries minus the documented exclusions
    — the inclusive-by-default sweep (VERDICT r5 item 5)."""
    return [
        n
        for n in qs
        if (n in oracles or n in bounds) and n not in STRESS_EXCLUDE
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
    # user-keyed analytics added after the first skew audit: the hot
    # user owns ~30% of all events, so every per-user window/join
    # below funnels it through one task — these prove the plans
    # survive that (bounded state per user, no cross-user blowup).
    "event_funnel_conversion",
    "weekly_cohort_retention",
    "cumulative_distinct_users_daily",
    "user_state_history_scd2",
    "asof_last_purchase_per_click",
    "purchases_without_prior_click",
    "rolling_7d_user_value",
    "daily_value_resample_ffill",
    "monotonic_violations_user_value",
    "distinct_user_event_pairs",
    # (user_id, event_type)-keyed lag window added in r9: the debounce
    # dedup funnels the hot user's ~30% share through one lag
    # partition — same survival contract as the windows above.
    "debounce_dedup_events",
]

#: Skew-sweep queries whose DUCKDB ORACLE is a range join that goes
#: quadratic on the hot key (pairs ~ (0.3*|events|)^2 for the hot
#: user): above these copy counts the oracle needs tens of GB and
#: hours while the Spark side stays linear (the operator docstrings
#: say exactly that the union-merge form exists to avoid the range
#: join at scale). The Spark plans remain skew-covered at the capped
#: scale; raising the cap requires a non-quadratic oracle, not a
#: bigger box. ABOVE the cap the sweep still EXECUTES their Spark
#: sides under the structural laws in SKEW_SPARK_ONLY_LAWS — the same
#: "oracle caps never cap Spark coverage" contract the uniform sweep
#: enforces for STRESS_EXCLUDE.
SKEW_ORACLE_MAX_COPIES = {
    "asof_last_purchase_per_click": 4,
    "purchases_without_prior_click": 4,
}

#: Structural laws for the oracle-capped skew entries, checked on the
#: SKEWED stress corpus where the value-hash oracle cannot follow.
#: The hot-key remap moves events BETWEEN users, so Kx-vs-1x row
#: counts are non-monotone (a remapped click loses its old user's
#: purchases and gains the hot pool) — the sound invariants come from
#: each operator's output SHAPE against the stress corpus itself:
#:
#: * inner as-of join emits AT MOST one row per left (click) row, and
#:   with a 30%-of-corpus hot user at least the hot user's clicks
#:   match: 0 < n_K <= |clicks_K|.
#: * left-outer interval join emits AT LEAST one row per left
#:   (purchase) row — null-padded when no click lands in the window:
#:   n_K >= |purchases_K| > 0.
#: Each lambda receives (n_K, n_clicks_K, n_purchases_K).
SKEW_SPARK_ONLY_LAWS: dict[str, tuple[str, object]] = {
    "asof_last_purchase_per_click": (
        "inner as-of: 0 < n_K <= |clicks|",
        lambda nK, clicks, purchases: 0 < nK <= clicks,
    ),
    "purchases_without_prior_click": (
        "left interval join: n_K >= |purchases| > 0",
        lambda nK, clicks, purchases: nK >= purchases > 0,
    ),
}


def skew_spark_only_sweep(
    spark, qs: dict, sf_dir: str, out_dir: str, copies: int
) -> list[str]:
    """Execute the Spark side of every oracle-capped skew entry at the
    full skewed stress scale and assert the SKEW_SPARK_ONLY_LAWS
    invariants plus schema stability vs 1x and key-range containment.
    Accounting is loud, mirroring spark_only_sweep: a capped entry
    missing from the catalog or missing its law FAILS instead of
    silently skipping."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{out_dir}/events.parquet")
    n_clicks = ev.where("event_type = 'click'").count()
    n_purch = ev.where("event_type = 'purchase'").count()
    failed: list[str] = []
    for name in sorted(SKEW_ORACLE_MAX_COPIES):
        if name not in qs:
            failed.append(name)
            print(
                f"FAIL  [skew-spark-only] {name}: capped but not in the "
                f"catalog — stale SKEW_ORACLE_MAX_COPIES entry"
            )
            continue
        if name not in SKEW_SPARK_ONLY_LAWS:
            failed.append(name)
            print(
                f"FAIL  [skew-spark-only] {name}: oracle-capped but has "
                f"no SKEW_SPARK_ONLY_LAWS entry — add a structural law"
            )
            continue
        desc, law = SKEW_SPARK_ONLY_LAWS[name]
        t0 = time.perf_counter()
        problems: list[str] = []
        try:
            base = qs[name](spark, sf_dir)
            schema1 = [
                (f.name, f.dataType.simpleString())
                for f in base.schema.fields
            ]
            big = qs[name](spark, out_dir)
            schemaK = [
                (f.name, f.dataType.simpleString())
                for f in big.schema.fields
            ]
            if schemaK != schema1:
                problems.append(f"schema drift: {schema1} -> {schemaK}")
            nK = big.count()
            if not law(nK, n_clicks, n_purch):
                problems.append(
                    f"law '{desc}' violated: n_K={nK} "
                    f"clicks={n_clicks} purchases={n_purch}"
                )
            id_cols = [
                f.name
                for f in big.schema.fields
                if f.name in ID_RANGE_COLS
                and f.dataType.simpleString() in ("bigint", "int", "long")
            ]
            if id_cols and nK > 0:
                aggs = []
                for c in id_cols:
                    aggs += [
                        F.min(c).alias(f"mn_{c}"),
                        F.max(c).alias(f"mx_{c}"),
                    ]
                row = big.agg(*aggs).collect()[0]
                hi = copies * KEY_STRIDE
                for c in id_cols:
                    mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
                    if mn is not None and not (0 <= mn and mx < hi):
                        problems.append(
                            f"key range {c}=[{mn},{mx}] outside [0,{hi})"
                        )
        except Exception as ex:  # noqa: BLE001
            problems = [f"raised {ex}"]
            nK = -1
        dt = time.perf_counter() - t0
        if problems:
            failed.append(name)
            print(
                f"FAIL  [skew-spark-only] {name} ({dt:.1f}s): "
                + "; ".join(problems)
            )
        else:
            print(
                f"MATCH [skew-spark-only] {name} ({dt:.1f}s): n_K={nK} "
                f"law ok ({desc})"
            )
    return failed

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
    args = [
        a
        for a in sys.argv[1:]
        if a
        not in (
            "--skew",
            "--spark-only-excluded",
            "--also-spark-only-excluded",
        )
    ]
    skew = "--skew" in sys.argv
    if skew and "--also-spark-only-excluded" in sys.argv:
        # the spark-only sweep's laws are derived for the UNIFORM
        # key-shifted build; silently skipping it under --skew would
        # be exactly the all-green-without-running failure the sweep's
        # loud accounting forbids.
        raise SystemExit(
            "--also-spark-only-excluded is not supported with --skew; "
            "run the spark-only sweep as its own non-skew invocation"
        )
    copies = int(args[0]) if args else 4
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    # per-process dir: a gate stress stage and a manual run must not
    # rmtree each other's in-flight data.
    out_dir = f"/tmp/spark_graft_stress-{os.getpid()}"

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from hadoop_data_pipeline_spark.session import get_session
    from tools.oracle_check import TABLES, compare, compare_bounded

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
    bounds = getattr(e, "bound_oracle_sql", dict)()
    skew_capped: list[str] = []
    if skew:
        headline = []
        for n in SKEW_HEADLINE:
            cap = SKEW_ORACLE_MAX_COPIES.get(n)
            if cap is not None and copies > cap:
                print(
                    f"SKIP {n}: range-join oracle quadratic on the hot "
                    f"key above {cap}x (see SKEW_ORACLE_MAX_COPIES) — "
                    f"Spark side still runs under its structural law "
                    f"below"
                )
                skew_capped.append(n)
                continue
            headline.append(n)
    else:
        headline = stress_headline(qs, oracles, bounds)
    if len(args) > 2:  # explicit query subset: stress.py K SF_DIR q1 q2 ...
        unknown = [n for n in args[2:] if n not in qs]
        if unknown:  # a typo must not produce a 0-query green sweep
            raise SystemExit(f"unknown queries: {unknown}")
        headline = list(args[2:])
    spark_only = "--spark-only-excluded" in sys.argv
    failed = []
    if spark_only:
        # Spark-side-only pass over the oracle-capped exclusions: no
        # DuckDB at all, structural-law assertions instead.
        failed = spark_only_sweep(spark, qs, sf_dir, out_dir, copies)
        n_run = len(STRESS_EXCLUDE)  # every exclusion is accounted for
        print(
            f"\n{n_run - len(failed)}/{n_run} spark-only excluded "
            f"queries pass at ~{copies}x sf0.1{mode}"
        )
        if not failed:
            shutil.rmtree(out_dir, ignore_errors=True)
        return 1 if failed else 0
    for name in headline:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, out_dir).toPandas()
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                problems = compare(sdf, ddf)
            else:
                spec = bounds[name]
                ddf = con.execute(spec["sql"]).df()
                problems = compare_bounded(sdf, ddf, spec["rel_tol"])
        except Exception as ex:  # noqa: BLE001
            problems = [f"raised {ex}"]
        dt = time.perf_counter() - t0
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"MATCH {name} ({dt:.1f}s): rows={len(sdf)}")
    print(f"\n{len(headline) - len(failed)}/{len(headline)} pass at ~{copies}x sf0.1{mode}")
    if skew_capped:
        # oracle caps never cap Spark coverage (the STRESS_EXCLUDE
        # precedent, extended to the skew sweep's range-join caps):
        # run the capped entries' Spark sides on the same skewed
        # corpus under structural laws.
        sc_failed = skew_spark_only_sweep(
            spark, qs, sf_dir, out_dir, copies
        )
        print(
            f"{len(SKEW_ORACLE_MAX_COPIES) - len(sc_failed)}/"
            f"{len(SKEW_ORACLE_MAX_COPIES)} skew-spark-only capped "
            f"queries pass at ~{copies}x{mode}"
        )
        failed += sc_failed
    if "--also-spark-only-excluded" in sys.argv and not skew:
        # append the spark-only sweep to the SAME invocation so the
        # gate pays the multi-minute corpus build once, not per step.
        so_failed = spark_only_sweep(spark, qs, sf_dir, out_dir, copies)
        n_run = len(STRESS_EXCLUDE)
        print(
            f"{n_run - len(so_failed)}/{n_run} spark-only excluded "
            f"queries pass at ~{copies}x sf0.1{mode}"
        )
        failed += so_failed
    if not failed:
        shutil.rmtree(out_dir, ignore_errors=True)  # keep data on FAIL
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

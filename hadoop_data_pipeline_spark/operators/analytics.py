"""Product-analytics operators (north-star extension): ordered funnel
conversion and cohort retention — the two queries every event store
answers, expressed in shapes that hold at 100 TB of events.

Funnel: the naive formulation is K self-joins (step k joined to step
k-1 on user + later-timestamp) — K shuffles of raw events and a range
predicate each. Here the ORDER is resolved by running-minimum window
columns over ONE (user, ts) sort: a step-k event qualifies iff some
qualifying step-(k-1) event sorts strictly before it. All window
layers share the same partitioning/ordering, so Catalyst plans one
exchange + one sort for the whole funnel, then a single partial
aggregate reduces to per-step user counts. No self-join, no range
join, no event ever leaves its user's partition.

Retention: two aggregates (per-user cohort anchor; per-(user, week)
activity) joined on user — both cluster on user_id, the activity
frame is already collapsed to one row per (user, week) before the
join, and the final count shuffles (cohort_week, week_offset) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel: one row per step with the number of users who
    completed the funnel prefix ending at that step (step k counts
    users with events s_1 < s_2 < ... < s_k in strict (ts, tie)
    order). Returns (step_index, step, n_users), step_index 1-based.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events
    qual_flags = []
    for i, step in enumerate(steps):
        flag = f"__q{i}"
        if i == 0:
            df = df.withColumn(
                flag, F.col(type_col) == F.lit(step)
            )
        else:
            prev_seen = F.min(
                F.when(F.col(f"__q{i-1}"), F.col(ts_col))
            ).over(w)
            df = df.withColumn(
                flag,
                (F.col(type_col) == F.lit(step)) & prev_seen.isNotNull(),
            )
        qual_flags.append(flag)
    per_user = df.groupBy(user_col).agg(
        *[
            F.max(F.col(f).cast("int")).alias(f"__r{i}")
            for i, f in enumerate(qual_flags)
        ]
    )
    counts = per_user.agg(
        *[F.sum(f"__r{i}").alias(f"__n{i}") for i in range(len(steps))]
    )
    rows = [
        f"struct({i + 1} AS step_index, '{s}' AS step, __n{i} AS n_users)"
        for i, s in enumerate(steps)
    ]
    return counts.selectExpr(
        f"inline(array({', '.join(rows)}))"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users anchored to the week of their
    first event; one row per (cohort_week, week_offset) with the
    number of cohort users active that week. week_offset 0 is the
    cohort week itself (always the full cohort size)."""
    week = F.date_trunc("WEEK", F.col(ts_col))
    anchors = events.groupBy(user_col).agg(
        F.date_trunc("WEEK", F.min(ts_col)).alias("cohort_week")
    )
    activity = (
        events.select(user_col, week.alias("week"))
        .groupBy(user_col, "week")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    joined = activity.join(anchors, user_col)
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
        / 604800
    ).cast("bigint")
    return (
        joined.select("cohort_week", offset.alias("week_offset"), F.col(user_col))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Count-min sketch with an EXACT oracle
# ---------------------------------------------------------------------------

#: Count-min geometry: depth d=4 hash rows, width w=256 buckets.
#: Overestimate bound: est - true <= 2N/w with prob >= 1 - 2^-d
#: (Cormode & Muthukrishnan 2005). Unlike the HLL entries (engine
#: sketch internals differ, so they carry bound oracles), the CMS is
#: OUR construction with pinned md5 row hashes — deterministic, so
#: DuckDB rebuilds the identical counter matrix and the driver can
#: value-hash it exactly.
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_hash_expr(
    key: str, d: str, dialect: str, width: int = CMS_WIDTH
) -> str:
    """Row-d bucket of a key: md5('cms<d>:<key>') mod width — the
    same text semantics in both engines (see functions/dual.py)."""
    from hadoop_data_pipeline_spark.functions import dual

    concat = (
        f"concat('cms', cast({d} as string), ':',"
        f" cast({key} as string))"
    )
    return f"CAST({dual.md5_int(concat, dialect)} % {width} AS INT)"


def cms_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch build + probe in one plan: the d x w counter
    matrix over ``key_col`` occurrences, probed for the k true
    heaviest keys — (key, true_count, cms_estimate, overestimate).
    ``overestimate >= 0`` always (CMS never undercounts); the entry's
    test pins the 2N/w bound per row.

    Scale: the build explodes each event into its ``depth`` (row,
    bucket) cells and partial-aggregates to at most d*w cells — the
    canonical distributed-sketch shape (tiny shuffle regardless of
    event volume, no per-key state). The probe side joins the
    BROADCAST <= d*w-row counter table onto the k anchor keys; events
    are scanned twice (counters; true top-k), both column-pruned to
    the key."""
    from hadoop_data_pipeline_spark.functions import dual

    hashes = F.array(
        *[
            F.expr(cms_hash_expr(key_col, str(d), dual.SPARK, width))
            for d in range(depth)
        ]
    )
    counters = (
        events.select(F.posexplode(hashes).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    top = (
        events.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
        .orderBy(F.desc("true_count"), F.col(key_col))
        .limit(k)
    )
    probes = top.select(
        key_col, "true_count", F.posexplode(hashes).alias("d", "bucket")
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy(key_col, "true_count")
        .agg(F.min("c").alias("cms_estimate"))
        .selectExpr(
            key_col,
            "true_count",
            "cms_estimate",
            "cast(cms_estimate - true_count as bigint) AS overestimate",
        )
    )


# ---------------------------------------------------------------------------
# Triangle counting with degree-ordered orientation
# ---------------------------------------------------------------------------


def triangle_participation(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected
    simple graph given as distinct ``a < b`` edges: (node,
    n_triangles) for every node in at least one triangle. Each
    triangle contributes once to each of its three corners.

    Scale design — degree-ordered edge orientation (Suri &
    Vassilvitskii, WWW'11 "the curse of the last reducer"): orient
    every edge from its lower-(degree, id) endpoint to the higher
    one, group each node's OUT-neighborhood into an adjacency list
    (bounded at O(sqrt(|E|)) per node by the orientation, regardless
    of how skewed the raw degree distribution is — the celebrity node
    with 10^7 neighbors keeps ~zero out-edges), and close triangles
    by intersecting the two endpoint adjacency lists of every
    oriented edge: for edge u->v the common out-neighbors
    N+(u) ∩ N+(v) are exactly the third corners w with u->w and
    v->w, i.e. each triangle is found EXACTLY once, at the edge
    joining its two minimum-(deg, id) corners — no /3 correction, no
    dedup pass. The r16 wedge form enumerated O(Σ outdeg²) wedge
    rows through a self-join and re-executed the closing-join
    subtree three times under the 3-way corner union; the
    intersection form replaces wedge self-join + closing join + the
    union with ONE adjacency groupBy, two node-keyed list joins and
    a single corner explode (r17: jobs 30 -> fewer, see
    plans/r17/copurchase_triangle_counts_*). Intersection inputs are
    plain id arrays; `array_intersect` hashes one side and walks the
    other — O(|N+(u)| + |N+(v)|) per edge, codegen'd, no Python."""
    ea, eb = F.col(a_col), F.col(b_col)
    deg = (
        edges.select(F.explode(F.array(ea, eb)).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("n", a_col), a_col)
        .withColumnRenamed("deg", "da")
        .join(
            deg.withColumnRenamed("n", b_col).withColumnRenamed(
                "deg", "db"
            ),
            b_col,
        )
    )
    lower = f"(da < db OR (da = db AND {a_col} < {b_col}))"
    oriented = e.selectExpr(
        f"CASE WHEN {lower} THEN {a_col} ELSE {b_col} END AS src",
        f"CASE WHEN {lower} THEN {b_col} ELSE {a_col} END AS dst",
    )
    # The ADJACENCY frame is the single persisted intermediate (the
    # r16 form persisted raw oriented edges and aggregated them twice;
    # persisting post-aggregation halves the materialization points):
    # the probe side below re-derives every oriented edge by exploding
    # the cached lists — carrying its u-side list along for free — so
    # one cache serves both intersection operands with ONE join.
    # collect_list (not collect_set): oriented edges are distinct by
    # construction (edges is a distinct a<b set), so the list has no
    # duplicates and skips the set's per-element hash dedup. The
    # returned frame derives from the cache lazily, so this function
    # cannot unpersist it; it carries the cache via `_with_cached_deps`
    # — one-shot drivers release it with clearCache-per-query;
    # ITERATIVE callers must call `queries.unpersist_deps(result)`
    # after materializing (the r13 verdict's enforcement ask).
    adj = (
        oriented.groupBy("src")
        .agg(F.collect_list("dst").alias("ns"))
        .persist()
    )
    probe = adj.select(
        F.col("src").alias("u"),
        F.explode("ns").alias("v"),
        F.col("ns").alias("nu"),
    )
    tri = (
        probe.join(
            adj.selectExpr("src AS __v", "ns AS nv"),
            F.col("v") == F.col("__v"),
        )
        .selectExpr("u", "v", "array_intersect(nu, nv) AS ws")
        .where(F.size("ws") > 0)
    )
    # Every triangle (u, v, w ∈ ws) credits each corner once: the w
    # corners come from the intersection array itself, u and v each
    # repeat size(ws) times — one explode, no union re-executing the
    # join per corner.
    corners = tri.select(
        F.explode(
            F.expr(
                "concat(ws, array_repeat(u, size(ws)),"
                " array_repeat(v, size(ws)))"
            )
        ).alias("node")
    )
    from hadoop_data_pipeline_spark.operators.queries import (
        _with_cached_deps,
    )

    out = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    return _with_cached_deps(out, adj)


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_pair_support: int = 2,
) -> DataFrame:
    """Market-basket association rules over (basket, item) rows:
    every directed rule antecedent -> consequent whose pair support
    meets ``min_pair_support``, with the three classical measures —
    support (co-occurrence count), confidence (P(consequent |
    antecedent)) and lift (observed co-occurrence over the
    independence expectation). The A-priori first rung (frequent
    pairs), kept exact rather than sampled.

    Scale: ONE keyed exchange groups each basket into its distinct
    item set (``collect_set`` — dedup and grouping share the
    exchange; the buffer is bounded by basket size and
    ObjectHashAggregate spills under pressure), persisted once, and
    every downstream frame derives from that cache. Directed pairs
    expand JVM-side from each basket's set — BOTH rule directions in
    the same codegen'd projection, so one aggregation produces every
    directed support (the earlier self-join + union-of-two-subtrees
    form planned the basket self-join AND the (a, c) pair aggregation
    TWICE — once per rule direction; r16 plan diff, see
    plans/r16/association_rules_copurchase_{before,after}.txt: keyed
    hash exchanges 6 -> 4, one (a, c) pair subtree instead of two,
    and the countDistinct basket-total exchange collapses to a
    SinglePartition merge of per-partition counts). Item counts and the
    basket total are partial aggregates over the same cache, and the
    support floor prunes the pair frame before the two measure
    joins. Ratios are computed once, rounded identically to the
    oracle."""
    # No scatter on the (basket, item) scan (r17): the map side below
    # the basket exchange is a trivial project + partial collect_set —
    # no expensive per-row work to parallelize — and the round-robin
    # exchange measurably COST time at bench scale (interleaved A/B,
    # 4 rounds: 1.28-1.86 s with vs 1.13-1.38 s without) while being
    # a no-op at production split counts either way (same finding as
    # copurchase_triangle_counts / pagerank_part_supplier).
    lists = (
        baskets.select(
            F.col(basket_col).alias("__bk"),
            F.col(item_col).alias("__it"),
        )
        .groupBy("__bk")
        .agg(F.collect_set("__it").alias("__items"))
        .persist()  # result-lifetime cache: tagged on the returned
        # frame via `_with_cached_deps` (see triangle_counts)
    )
    n_b = lists.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    item = (
        lists.select(F.explode("__items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    both_dirs = (
        "flatten(transform(__items, x -> "
        "transform(filter(__items, y -> y != x), "
        "y -> struct(x AS a, y AS c))))"
    )
    directed = (
        lists.where(F.size("__items") >= 2)
        .select(F.explode(F.expr(both_dirs)).alias("p"))
        .select("p.*")
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
        .where(F.col("pair_support") >= min_pair_support)
    )
    from hadoop_data_pipeline_spark.operators.queries import (
        _with_cached_deps,
    )

    out = (
        directed.join(
            item.selectExpr("item AS a", "cnt AS antecedent_count"), "a"
        )
        .join(
            item.selectExpr("item AS c", "cnt AS consequent_count"), "c"
        )
        .crossJoin(F.broadcast(n_b))
        .selectExpr(
            "a AS antecedent",
            "c AS consequent",
            "pair_support",
            "antecedent_count",
            "consequent_count",
            "round(cast(pair_support as double)"
            " / cast(antecedent_count as double), 6) AS confidence",
            "round(cast(pair_support as double) * cast(n_baskets as double)"
            " / (cast(antecedent_count as double)"
            "    * cast(consequent_count as double)), 6) AS lift",
        )
    )
    return _with_cached_deps(out, lists)

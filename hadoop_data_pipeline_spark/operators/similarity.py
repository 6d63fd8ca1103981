"""Similarity search over embedding columns (north-star extension).

Two paths:
* ``cosine_topk`` — brute-force exact top-k: query set x candidate
  set, cosine in double precision, per-query window top-k. The
  baseline; exact but O(|Q| * N). Fine when |Q| is bounded (the usual
  "find neighbors of these items" shape) because the candidate scan
  parallelizes perfectly and the query side broadcasts.
* ``ann_topk_lsh`` — random-hyperplane LSH: each vector gets a 8-bit
  bucket from deterministic +/-1 planes (dual.ANN_PLANES); queries only
  compare against candidates in the same bucket (~N/256 of the data),
  trading recall for a 256x reduction in pair comparisons. At 100 TB
  the bucket column is computed once at ingest and the join
  hash-partitions on it — embeddings are shuffled once, not N times.

Both are pure Catalyst expressions (fold-based dot products) — no
UDFs — and deterministic, so both have exact DuckDB oracles.

The embedding-cosine near-dup dedup variant lives here too: all pairs
above a cosine threshold inside an LSH bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.functions import dual
from hadoop_data_pipeline_spark.operators.queries import (
    _with_cached_deps,
    scatter_small_scan,
    top_k_per_group,
    unpersist_deps,  # noqa: F401 - re-exported; callers pair it with the
    # persist()ing operators below (see its docstring)
)

# r16 parallelism note: every scoring operator below scatters its
# candidate frame via ``scatter_small_scan`` before the expensive
# per-row distance/norm projections — a small single-split embeddings
# parquet otherwise runs the whole fold-expression pipeline on one
# core (measured: ann_topk_ivfpq_rerank 3.2 -> 1.7 s warm at sf0.1).
# No-op at production split counts. Safe here because all math below
# the scatter is per-row folds plus min/max/row_number aggregation —
# no float partial-sum order dependence. The float-averaging trainers
# (``kmeans_refine_stats``, ``fit_*``) deliberately do NOT scatter:
# their per-cell means merge in partial order and the oracle pins the
# single-split accumulation order.


def with_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", F.expr(dual.ann_bucket(vec_col, dual.SPARK)))


def _guard_block_sizes(
    df: DataFrame,
    block_col: str,
    max_block_size: int | None,
    op_name: str,
) -> None:
    """Shared oversized-block guard for the blocked all-pairs joins
    (:func:`embedding_near_dup_pairs`, :func:`hard_negative_pairs`):
    one column-pruned aggregate scan counts the blocks up front and
    raises if any exceeds ``max_block_size`` — a 10M-row block is 50
    trillion pairs; failing loudly beats planning it. ``None``
    disables the guard for callers that pre-validated their blocks."""
    if max_block_size is None:
        return
    oversized = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_block_size)
        .limit(3)
        .collect()
    )
    if oversized:
        worst = ", ".join(f"{r[block_col]}={r['__n']}" for r in oversized)
        raise ValueError(
            f"{op_name}: block(s) exceed max_block_size="
            f"{max_block_size} ({worst}); use a finer block key (e.g. "
            f"block_col=None for LSH buckets) or raise the bound "
            f"explicitly"
        )


def cosine_topk(
    df: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for a bounded query set.

    The query side is a handful of rows — broadcast it so the
    candidate scan never shuffles.
    """
    df = scatter_small_scan(df)
    nrm = dual.norm(vec_col, dual.SPARK)
    queries = df.where(F.col(id_col).isin(*query_ids)).selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS qvec", f"{nrm} AS qn"
    )
    cands = df.selectExpr(
        f"{id_col} AS cand_id", f"{vec_col} AS cvec", f"{nrm} AS cn"
    )
    cos = dual.cosine_staged("qvec", "cvec", "qn", "cn", dual.SPARK)
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{cos} AS cosine")
    )
    return top_k_per_group(
        scored, ["query_id"], "cosine", k=k, tie_breakers=["cand_id"]
    )


def ann_topk_lsh(
    df: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Recall < 1 by design; bucket count (256) bounds the work."""
    bucketed = with_bucket(scatter_small_scan(df), vec_col)
    nrm = dual.norm(vec_col, dual.SPARK)
    queries = bucketed.where(F.col(id_col).isin(*query_ids)).selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS qvec", f"{nrm} AS qn", "bucket"
    )
    cands = bucketed.selectExpr(
        f"{id_col} AS cand_id", f"{vec_col} AS cvec", f"{nrm} AS cn", "bucket"
    )
    cos = dual.cosine_staged("qvec", "cvec", "qn", "cn", dual.SPARK)
    scored = (
        F.broadcast(queries)
        .join(cands, "bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{cos} AS cosine")
    )
    return top_k_per_group(
        scored, ["query_id"], "cosine", k=k, tie_breakers=["cand_id"]
    )


def lsh_probe_buckets_expr(
    vec_col: str, bucket_col: str, n_probe: int
) -> str:
    """MULTI-PROBE bucket list for the sign-LSH scheme
    (:func:`dual.ann_bucket`): the vector's own bucket plus its
    ``n_probe - 1`` most-promising Hamming-1 neighbors — the buckets
    reached by flipping the sign bits with the SMALLEST projection
    margin ``|plane_j . v|`` (classic multi-probe LSH: a near-zero
    margin means a near-duplicate vector plausibly landed on the
    other side of that plane, so that neighbor bucket is where missed
    neighbors live). Returns a SQL expression producing a distinct
    ``array<int>`` of ``n_probe`` bucket ids; explode it on the QUERY
    side only — the candidate/store side keeps exactly one bucket per
    row, so the probe fan-out is |Q| x n_probe, never corpus-sized.

    ``n_probe`` is capped at 1 + n_planes (own bucket + every
    Hamming-1 flip); deeper probing should raise the plane count, not
    enumerate Hamming-2 shells."""
    n_planes = len(dual.ANN_PLANES)
    if not 1 <= n_probe <= 1 + n_planes:
        raise ValueError(
            f"n_probe must be in [1, {1 + n_planes}], got {n_probe}"
        )
    if n_probe == 1:
        return f"array(cast({bucket_col} as int))"
    margins = "array(%s)" % ", ".join(
        f"abs({dual.dot(vec_col, dual.plane_literal(p, dual.SPARK), dual.SPARK)})"
        for p in dual.ANN_PLANES
    )
    flips = (
        f"transform(array_sort(zip_with({margins},"
        f" sequence(0, {n_planes - 1}), (m, j) -> struct(m, j))),"
        f" s -> cast({bucket_col} ^ shiftleft(1, s.j) as int))"
    )
    return (
        f"slice(concat(array(cast({bucket_col} as int)), {flips}),"
        f" 1, {n_probe})"
    )


def ann_topk_lsh_multiprobe(
    df: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: like :func:`ann_topk_lsh`, but each
    query also probes its ``n_probe - 1`` smallest-margin Hamming-1
    neighbor buckets (:func:`lsh_probe_buckets_expr`), recovering the
    neighbors single-bucket LSH loses to one sign flip at ~n_probe/256
    of the corpus per query instead of 1/256 — the standard
    recall-vs-work dial that avoids the alternative of re-hashing the
    corpus under more tables. Candidate side keeps one bucket per row
    (never replicated); only the kilobyte broadcast query side fans
    out. Deterministic (margin ties broken by plane index), so it has
    an exact SQL oracle."""
    return ann_topk_filtered(
        df,
        query_ids,
        "true",  # unfiltered: the constant predicate folds away
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
    )


def ann_topk_filtered(
    df: DataFrame,
    query_ids: Sequence[int],
    predicate: str,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FILTERED ANN — "nearest neighbors WHERE <predicate>", the
    production retrieval shape (search within a language / license /
    domain / freshness slice). The predicate applies to the CANDIDATE
    side BELOW the bucket join — and when it is SOURCE-PUSHABLE
    (equality / comparison / IN on a column), Catalyst pushes it all
    the way into the parquet scan, where partition and row-group
    pruning carry it at 100 TB (arithmetic predicates like ``x % 3 =
    1`` stop at a Filter directly above the scan: still pre-join,
    still column-pruned, just no row-group skipping — prefer storing
    sliceable attributes as plain columns). The query side is NOT
    filtered — you search FROM any vector INTO the slice. This is PRE-filter ANN: post-filtering a top-k (the
    naive composition) returns fewer than k usable rows whenever the
    slice is sparse in the query's bucket, while pre-filtering ranks
    k true slice members. Composes with multi-probe (``n_probe``) —
    sparse slices thin every bucket, which is exactly when probing
    neighbor buckets pays."""
    bucketed = with_bucket(scatter_small_scan(df), vec_col)
    nrm = dual.norm(vec_col, dual.SPARK)
    queries = bucketed.where(F.col(id_col).isin(*query_ids)).selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS qvec", f"{nrm} AS qn", "bucket"
    )
    probes = queries.selectExpr(
        "query_id",
        "qvec",
        "qn",
        f"explode({lsh_probe_buckets_expr('qvec', 'bucket', n_probe)})"
        " AS bucket",
    )
    cands = bucketed.where(predicate).selectExpr(
        f"{id_col} AS cand_id", f"{vec_col} AS cvec", f"{nrm} AS cn", "bucket"
    )
    cos = dual.cosine_staged("qvec", "cvec", "qn", "cn", dual.SPARK)
    scored = (
        F.broadcast(probes)
        .join(cands, "bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{cos} AS cosine")
    )
    return top_k_per_group(
        scored, ["query_id"], "cosine", k=k, tie_breakers=["cand_id"]
    )


def _lloyd_fit(sample, k: int, seed: int = 42, max_iter: int = 10):
    """Deterministic k-means over a SMALL in-memory sample (the IVF
    coarse quantizer): seeded k-means++ init, vectorized Lloyd
    iterations, empty clusters re-seeded to the point farthest from
    its assigned center (deterministic tie-break by index). Runs in
    milliseconds for the capped train sample; the distributed part of
    IVF is only the argmin ASSIGNMENT, which is a codegen'd
    projection."""
    import numpy as np

    n = len(sample)
    if n == 0:
        raise ValueError("empty train sample")
    k = min(k, n)
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    centers = [sample[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(
            ((sample[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(
                -1
            ),
            axis=1,
        )
        total = d2.sum()
        if total <= 0:  # all points coincide with a center
            centers.append(sample[rng.randint(n)])
            continue
        # clip: float rounding can leave cumsum[-1] < 1.0, and a draw
        # in that gap would index one past the end.
        idx = min(
            int(np.searchsorted(np.cumsum(d2 / total), rng.rand())), n - 1
        )
        centers.append(sample[idx])
    centers = np.asarray(centers, dtype=np.float64)
    for _ in range(max_iter):
        d2 = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        new = np.empty_like(centers)
        # Empty clusters re-seed to the points FARTHEST from their
        # assigned centers — distinct per empty cluster (handing the
        # same point to two empties would pin duplicate centroids).
        farthest = iter(np.argsort(-d2.min(axis=1)))
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                new[j] = members.mean(axis=0)
            else:
                new[j] = sample[next(farthest)]
        if np.allclose(new, centers):
            centers = new
            break
        centers = new
    return centers


def fit_coarse_quantizer(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Train the IVF coarse quantizer on a deterministic capped sample
    and return the centroids as plain floats — the TRAIN half of IVF,
    split out so a quantizer can be fitted once, persisted (e.g. as a
    code/config constant), and applied to any later corpus snapshot
    with :func:`ann_topk_ivf`'s ``centroids`` parameter — the
    production shape at 100 TB, where the quantizer is a versioned
    artifact, not a per-query fit.

    Sampling: hash the id (crc32), keep the ``train_cap`` smallest
    buckets — deterministic, stable at the margin as the corpus grows
    (a fraction-sample would need a count() pass), bounded collect.
    The Lloyd fit itself is driver-side vectorized numpy over the
    capped sample (see :func:`_lloyd_fit` for why not Spark ML)."""
    import numpy as np

    train_cap = max(200 * n_centroids, 1000)
    train = (
        df.select(
            id_col, vec_col, F.crc32(F.col(id_col).cast("string")).alias("__r")
        )
        .orderBy("__r", id_col)
        .limit(train_cap)
        .select(vec_col)
        .toPandas()
    )
    sample = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in train[vec_col]]
    )
    return [
        [float(x) for x in c]
        for c in _lloyd_fit(sample, n_centroids, seed=seed, max_iter=10)
    ]


#: argmin over a staged __d2 column — ALWAYS stage the distance array
#: with :func:`centroid_d2_expr` first; inlining the d2 expression
#: here would duplicate the centroid literal tree per consumer (that
#: form measurably doubled cold-plan time).
CELL_FROM_D2 = "cast(array_position(__d2, array_min(__d2)) - 1 as int)"


def probe_cells_expr(n_centroids: int, n_probe: int) -> str:
    """The ``n_probe`` nearest cells from a staged ``__d2`` column —
    the query-side half of every IVF family member (shared so the
    probe order, incl. the tie-break on cell index, can never diverge
    between variants)."""
    return (
        f"transform(slice(array_sort(zip_with(__d2,"
        f" sequence(0, {n_centroids - 1}), (d, i) -> struct(d AS d, i AS i)"
        f")), 1, {n_probe}), s -> s.i) AS probe_cells"
    )


def centroid_d2_expr(
    cents: Sequence[Sequence[float]], vec_col: str
) -> str:
    """Squared distance of ``vec_col`` to every centroid as ONE
    transform over a nested centroid-literal array — a single compact
    expression the analyzer/codegen handles once, instead of
    n_centroids separate aggregate() expressions duplicated per
    consumer. The 'D' suffix makes each literal a DOUBLE node
    directly — a bare 1.234 parses as DECIMAL and would need a Cast
    node each, doubling the literal tree the analyzer re-walks per
    transform. SHARED by the batch IVF query and the streaming
    embedding sink so cell assignment can never diverge between them."""
    return (
        f"transform({centroid_array_lit(cents)}, c -> "
        f"aggregate(zip_with({vec_col}, c, "
        "(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
        "cast(0.0 as double), (a, v) -> a + v))"
    )


def centroid_array_lit(cents: Sequence[Sequence[float]]) -> str:
    """The pinned centroids as one nested DOUBLE-literal array."""
    return "array(%s)" % ", ".join(
        "array(%s)" % ", ".join(f"{float(v)!r}D" for v in c) for c in cents
    )


def residual_expr(
    cents: Sequence[Sequence[float]], vec_col: str, cell_col: str
) -> str:
    """``vec - centroid[cell]`` as doubles — the quantity residual
    PQ encodes (and the query side subtracts before ADC)."""
    return (
        f"zip_with({vec_col}, element_at({centroid_array_lit(cents)},"
        f" {cell_col} + 1), (x, y) -> cast(x as double) - y)"
    )


def ann_topk_ivf(
    df: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer assigns every vector to
    a centroid cell; each query scores only the cells of its
    ``n_probe`` nearest centroids (~n_probe/n_centroids of the corpus).

    The quantizer trains on a seeded hash-sample capped at
    ``train_cap`` vectors — a coarse quantizer needs only enough
    points to place ``n_centroids`` centers, so at 100 TB training
    never scans the corpus. Because the sample is CAPPED, the Lloyd
    fit runs driver-side on the collected sample with vectorized
    numpy (deterministic k-means++ init, fixed seed): a bounded
    ~megabyte model fit in milliseconds, versus Spark ML KMeans
    launching max_iter distributed jobs over a 3k-row frame — pure
    scheduler overhead at any corpus size (measured ~1.5 s of the
    query's 3-4 s at sf0.1). The collect is bounded by train_cap,
    never by the corpus. Cell assignment is a codegen'd argmin over
    the centroid-distance array — one narrow projection at ingest;
    the probe join hash-partitions on the cell — the classic IVF
    trade: recall for a corpus-fraction's worth of dot products.

    ``centroids`` injects a PRETRAINED quantizer (the production
    shape: train once via :func:`fit_coarse_quantizer`, version the
    ~kilobyte model, apply to every later corpus snapshot — and the
    shape that makes the whole query SQL-expressible for the DuckDB
    oracle, since assignment/probe/score over constant centroids is
    pure relational algebra). When omitted, fits in-line on the
    deterministic capped sample.
    """
    if centroids is not None:
        cents = [[float(x) for x in c] for c in centroids]
        n_centroids = len(cents)
    else:
        cents = fit_coarse_quantizer(
            df, n_centroids, id_col=id_col, vec_col=vec_col
        )
    assigned = (
        scatter_small_scan(df)
        .withColumn("__d2", F.expr(centroid_d2_expr(cents, vec_col)))
        .withColumn("cell", F.expr(CELL_FROM_D2))
        .persist()
    )
    probes = (
        assigned.where(F.col(id_col).isin(*query_ids))
        .selectExpr(
            f"{id_col} AS query_id",
            f"{vec_col} AS qvec",
            f"{dual.norm(vec_col, dual.SPARK)} AS qn",
            "__d2",
        )
        .selectExpr(
            "query_id",
            "qvec",
            "qn",
            probe_cells_expr(n_centroids, n_probe),
        )
        .select(
            "query_id", "qvec", "qn",
            F.explode("probe_cells").alias("cell"),
        )
    )
    cands = assigned.selectExpr(
        f"{id_col} AS cand_id",
        f"{vec_col} AS cvec",
        f"{dual.norm(vec_col, dual.SPARK)} AS cn",
        "cell",
    )
    cos = dual.cosine_staged("qvec", "cvec", "qn", "cn", dual.SPARK)
    scored = (
        F.broadcast(probes)
        .join(cands, "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{cos} AS cosine")
        .distinct()  # a candidate may appear via multiple probed cells
    )
    out = top_k_per_group(
        scored, ["query_id"], "cosine", k=k, tie_breakers=["cand_id"]
    )
    return _with_cached_deps(out, assigned)


def hard_negative_pairs(
    df: DataFrame,
    lo: float = 0.15,
    hi: float = 0.3,
    per_anchor: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    max_block_size: int | None = 100_000,
) -> DataFrame:
    """Contrastive-training hard-negative mining: per ANCHOR vector,
    the ``per_anchor`` most-similar candidates in the cosine band
    ``[lo, hi)`` — similar enough to be informative negatives, below
    the near-duplicate threshold so they are not false negatives
    (pairs >= ``hi`` belong to :func:`embedding_near_dup_pairs` /
    dedup, not to the negatives file). The standard mining step for
    embedding-model training data.

    Scale: the same blocked equi-join as
    :func:`embedding_near_dup_pairs` (``block_col=None`` falls back
    to the 256-way sign-LSH bucket), but with AUTOMATIC SUB-BLOCKING
    instead of that operator's oversized-block raise: any block
    larger than ``max_block_size`` is deterministically split into
    ``ceil(n / max_block_size)`` sub-blocks by a secondary id hash,
    and candidates only meet within a sub-block. At 100 TB a hot
    label (one dominant language) is the EXPECTED case — mining must
    degrade gracefully there, and the trade is sound for THIS
    operator because hard negatives are a sampling problem, not an
    exhaustive one: each anchor draws its band candidates from a
    uniform ~``max_block_size``-row hash sample of its block rather
    than the whole block, which changes which negatives are found,
    never their validity (every emitted pair still satisfies the
    cosine band). Dedup-flavored blocked joins keep the loud guard —
    a near-dup pair missed across sub-blocks would be a correctness
    loss there (`_guard_block_sizes`).

    The split is IN-PLAN, mirroring ``dedup`` ``presieve_hot``: one
    column-pruned partial-agg pass finds oversized blocks (at most
    ``n / max_block_size`` rows, so it broadcasts), a broadcast left
    join attaches each row's split factor, and ``xxhash64(id) %
    n_sub`` assigns the sub-block — deterministic across retries,
    zero driver action. Blocks within bound get sub 0 and
    byte-identical output to the unsplit form (the oracle contract).
    The band filter then bounds what the per-anchor window top-k
    sorts, so output is at most ``per_anchor`` rows per vector
    regardless of block density.

    When sub-blocking ACTIVATES, the tagged (id, vec, block, sub)
    projection is PERSISTED before the pair join (the
    `ann_topk_ivf` persisted-assignment precedent — both join sides
    consume it, and leaving the split lineage inline measurably
    re-evaluates inside the join stage: 66.6 s vs 24.6 s
    pre-materialized on the dense 10x fixture). A cheap bounded
    aggregate probes for oversized blocks first, so corpora with
    none — every fixture, the catalog entry, the stress sweeps —
    keep the EXACT unsplit two-scan plan and pay only the probe
    (the same one-aggregate action the r11 guard already paid).
    Returned frame carries the cache via `_with_cached_deps`.

    Operating guidance (measured, dense 10x fixture — SCALE.md r12):
    the cap bounds per-task pair work at ``max_block_size^2``; a
    5-way split of ~2.2k-dense blocks ran 2.5x faster than the
    unsplit join even before the persist, and the persist removes
    the split lineage's join-stage overhead at every split factor."""
    df = scatter_small_scan(df)
    if block_col is None:
        df = with_bucket(df, vec_col)
        block_col = "bucket"
    deps: list[DataFrame] = []
    if max_block_size is not None:
        oversized = (
            df.groupBy(block_col)
            .agg(F.count(F.lit(1)).alias("__bn"))
            .where(F.col("__bn") > max_block_size)
            .select(
                block_col,
                F.ceil(F.col("__bn") / max_block_size)
                .cast("int")
                .alias("__nsub"),
            )
        )
        if oversized.limit(1).count():
            # coalesce(nsub, 1): pmod(x, 1) == 0 gives unsplit blocks
            # sub 0 without a CASE WHEN branch and keeps the join key
            # non-nullable.
            df = (
                df.join(F.broadcast(oversized), block_col, "left")
                .withColumn(
                    "__sub",
                    F.pmod(
                        F.xxhash64(F.col(id_col)),
                        F.coalesce(F.col("__nsub"), F.lit(1)),
                    ).cast("int"),
                )
                .select(id_col, vec_col, block_col, "__sub")
                .persist()
            )
            deps.append(df)
        else:
            df = df.withColumn("__sub", F.lit(0))
    else:
        df = df.withColumn("__sub", F.lit(0))
    nrm = dual.norm(vec_col, dual.SPARK)
    a = df.selectExpr(
        f"{id_col} AS anchor_id",
        f"{vec_col} AS va",
        f"{nrm} AS na_",
        f"{block_col} AS blk",
        "__sub AS sub_a",
    )
    b = df.selectExpr(
        f"{id_col} AS cand_id",
        f"{vec_col} AS vb",
        f"{nrm} AS nb_",
        f"{block_col} AS __blk_b",
        "__sub AS sub_b",
    )
    cos = dual.cosine_staged("va", "vb", "na_", "nb_", dual.SPARK)
    band = (
        a.join(
            b,
            (F.col("blk") == F.col("__blk_b"))
            & (F.col("sub_a") == F.col("sub_b")),
        )
        .where(F.col("anchor_id") != F.col("cand_id"))
        .selectExpr("anchor_id", "cand_id", "blk", f"{cos} AS cosine")
        .where((F.col("cosine") >= lo) & (F.col("cosine") < hi))
    )
    out = top_k_per_group(
        band,
        ["anchor_id"],
        "cosine",
        k=per_anchor,
        tie_breakers=["cand_id"],
    )
    return _with_cached_deps(out, *deps)


def kmeans_refine_stats(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE distributed Lloyd iteration over the FULL corpus, returning
    per-cluster convergence stats: assign every vector to its nearest
    pinned centroid, recompute each cluster's mean, and report
    ``(cell, n_vecs, sse_before, sse_after)`` where *before/after* are
    the within-cluster squared-error sums against the old and updated
    centroid (Lloyd's lemma: with assignment fixed, the mean minimizes
    SSE, so ``sse_after <= sse_before`` per cell — pinned by test).

    This is the scale half of k-means that :func:`_lloyd_fit`'s
    capped-sample trainer deliberately skips: when the QUANTIZER is
    the product (SemDeDup-style cluster-then-dedup, corpus
    bucketing), refinement must see every vector. Design per
    iteration at 100 TB: one column-pruned scan into a PERSISTED
    assignment frame (MEMORY_AND_DISK, the contract iterative
    fitting always uses — the argmin over the centroid-literal tree
    is the iteration's expensive projection and both consumers below
    need it, so spilling beats recomputing; same precedent as
    :func:`ann_topk_ivf`), one partial-agg'd shuffle of at most
    ``n_cells x n_dims`` running means (posexplode feeds map-side
    combine, so the x64 row fan-out collapses to 1k-group partials
    per partition), and a broadcast of the kilobyte-sized updated
    centroids back onto the corpus — no driver-side loop over rows
    anywhere. Iterating = re-invoking with the returned means
    (:func:`fit_coarse_quantizer` stays the cheap way to BOOTSTRAP
    centroids; this is the way to POLISH them on everything)."""
    d2 = centroid_d2_expr(centroids, vec_col)
    asg = (
        df.selectExpr(id_col, vec_col, f"{d2} AS __d2")
        .selectExpr(
            id_col,
            vec_col,
            f"{CELL_FROM_D2} AS cell",
            "array_min(__d2) AS d2_old",
        )
        .persist()
    )
    newc = (
        asg.select("cell", F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("mu"))
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(dim, mu))),"
                " s -> s.mu)"
            ).alias("newcent")
        )
    )
    diff2 = (
        f"zip_with({vec_col}, newcent, (x, y) ->"
        " (cast(x as double) - y) * (cast(x as double) - y))"
    )
    d2_new = dual.fold(
        diff2, "cast(0.0 as double)", "(acc, v) -> acc + v", dual.SPARK
    )
    out = (
        asg.join(F.broadcast(newc), "cell")
        .selectExpr("cell", "d2_old", f"{d2_new} AS d2_new")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("d2_old"), 3).alias("sse_before"),
            F.round(F.sum("d2_new"), 3).alias("sse_after"),
        )
    )
    return _with_cached_deps(out, asg)


def fit_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split the vector into
    ``m`` contiguous subvectors and fit an independent ``k``-codeword
    quantizer per subvector (same deterministic capped hash-sample +
    seeded Lloyd as :func:`fit_coarse_quantizer`). Returns
    ``codebooks[s][j]`` = codeword ``j`` of subvector ``s`` — a
    ~kilobyte versioned artifact, exactly like the IVF centroids.

    PQ is the MEMORY side of ANN at 100 TB: with m=8, k=16 a
    64-dim float32 vector (256 B) compresses to eight 4-bit codes
    (4 B, 64x) while distances stay computable from the codes alone
    (:func:`pq_topk`), so a candidate scan touches 4 B/vector
    instead of the raw embedding column."""
    import numpy as np

    train_cap = max(200 * k, 1000)
    train = (
        df.select(
            id_col, vec_col, F.crc32(F.col(id_col).cast("string")).alias("__r")
        )
        .orderBy("__r", id_col)
        .limit(train_cap)
        .select(vec_col)
        .toPandas()
    )
    sample = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in train[vec_col]]
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    sub = sample.reshape(len(sample), m, d_sub)
    return [
        [
            [float(x) for x in cw]
            for cw in _lloyd_fit(
                np.ascontiguousarray(sub[:, s, :]), k, seed=seed, max_iter=10
            )
        ]
        for s in range(m)
    ]


def _pq_cb_lit(codebooks: Sequence[Sequence[Sequence[float]]]) -> str:
    return "array(%s)" % ", ".join(
        "array(%s)"
        % ", ".join(
            "array(%s)" % ", ".join(f"{float(v)!r}D" for v in cw)
            for cw in cb
        )
        for cb in codebooks
    )


def pq_d2_expr(
    codebooks: Sequence[Sequence[Sequence[float]]], vec_col: str
) -> str:
    """Per-subvector squared distances to every codeword as ONE nested
    expression -> ``array<array<double>>``. Stage it as ``__pqd2``
    before taking the argmin (same staging rule as
    :func:`centroid_d2_expr`)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    return (
        f"zip_with({_pq_cb_lit(codebooks)}, sequence(0, {m - 1}),"
        f" (cb, s) -> transform(cb, c -> aggregate("
        f"zip_with(slice({vec_col}, s * {d} + 1, {d}), c,"
        " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        " cast(0.0 as double), (a, v) -> a + v)))"
    )


#: argmin per subvector over a staged __pqd2 column -> array<int> codes.
PQ_CODE_FROM_D2 = (
    "transform(__pqd2, ds ->"
    " cast(array_position(ds, array_min(ds)) - 1 as int))"
)


def pq_reconstruct_expr(
    codebooks: Sequence[Sequence[Sequence[float]]], code_col: str
) -> str:
    """Decode a PQ code array back to its codeword concatenation — the
    reconstruction ADC distances are computed against."""
    return (
        f"flatten(zip_with({_pq_cb_lit(codebooks)}, {code_col},"
        " (cb, c) -> element_at(cb, c + 1)))"
    )


def pq_topk(
    df: DataFrame,
    query_ids: Sequence[int],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN: encode every candidate to ``m`` small
    codes (one codegen'd projection), then rank candidates per query
    by ASYMMETRIC distance — full-precision query against the
    candidate's codeword reconstruction (ADC: ``||q - recon(c)||^2 =
    sum_s ||q_s - cb_s[c_s]||^2``). Exact per-query top-k over the
    approximate distance, so with the codebooks CONSTANT the whole
    query is relational algebra with an exact SQL oracle (the IVF
    precedent, `queries_catalog.py::embedding_ann_ivf_topk`).

    Scale: the candidate side scans CODES (m bytes/vector, 64x
    smaller than the raw embedding column at m=8/k=16 on dim-64
    float32) — at 100 TB the codes are materialized once at ingest
    and the raw vectors never travel; the bounded query set
    broadcasts; top-k is a per-query-partition window
    (TakeOrdered-shaped, never a global sort). Recall loss is the
    quantization error — measured against brute force in
    tests/test_extensions.py; IVF composes with PQ (cell-filter then
    ADC) when both artifacts exist."""
    df = scatter_small_scan(df)
    cands = (
        df.selectExpr(id_col, f"{pq_d2_expr(codebooks, vec_col)} AS __pqd2")
        .selectExpr(f"{id_col} AS cand_id", f"{PQ_CODE_FROM_D2} AS code")
        .selectExpr(
            "cand_id", f"{pq_reconstruct_expr(codebooks, 'code')} AS rvec"
        )
    )
    queries = df.where(F.col(id_col).isin(*query_ids)).selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS qvec"
    )
    adc = dual.fold(
        "zip_with(qvec, rvec, (x, y) ->"
        " (cast(x as double) - y) * (cast(x as double) - y))",
        "cast(0.0 as double)",
        "(a, v) -> a + v",
        dual.SPARK,
    )
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{adc} AS adc_dist2")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        "adc_dist2",
        k=k,
        ascending=True,
        tie_breakers=["cand_id"],
    )


def ann_topk_ivfpq(
    df: DataFrame,
    query_ids: Sequence[int],
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the two pinned artifacts composed the way a production
    vector index composes them — the coarse quantizer prunes WHICH
    candidates each query scores (~n_probe/n_centroids of the
    corpus), PQ codes shrink WHAT the scan reads per candidate
    (m bytes instead of the raw vector). Candidates are ranked by the
    same asymmetric distance as :func:`pq_topk`, restricted to the
    query's probed cells.

    One honest simplification vs a FAISS-style IVFPQ: codes quantize
    the RAW vectors, not the per-cell residuals (x - centroid), so
    the two artifacts stay independently versioned and the query
    remains exact relational algebra over both constants; residual
    encoding is the accuracy refinement a dependent-artifact pipeline
    would add.

    Scale: cell assignment and PQ encode are one codegen'd projection
    at ingest; the probe join hash-partitions on the cell with the
    kilobyte query side broadcast; top-k per query is window-pushed
    (WindowGroupLimit). The raw embedding column is read ONCE (at
    encode) and never travels through the join."""
    cents = [[float(x) for x in c] for c in centroids]
    n_centroids = len(cents)
    assigned = (
        scatter_small_scan(df)
        .withColumn("__d2", F.expr(centroid_d2_expr(cents, vec_col)))
        .withColumn("cell", F.expr(CELL_FROM_D2))
        .persist()
    )
    cands = (
        assigned.selectExpr(
            f"{id_col} AS cand_id",
            "cell",
            f"{pq_d2_expr(codebooks, vec_col)} AS __pqd2",
        )
        .selectExpr("cand_id", "cell", f"{PQ_CODE_FROM_D2} AS code")
        .selectExpr(
            "cand_id", "cell", f"{pq_reconstruct_expr(codebooks, 'code')} AS rvec"
        )
    )
    probes = (
        assigned.where(F.col(id_col).isin(*query_ids))
        .selectExpr(f"{id_col} AS query_id", f"{vec_col} AS qvec", "__d2")
        .selectExpr(
            "query_id",
            "qvec",
            probe_cells_expr(n_centroids, n_probe),
        )
        .select("query_id", "qvec", F.explode("probe_cells").alias("cell"))
    )
    adc = dual.fold(
        "zip_with(qvec, rvec, (x, y) ->"
        " (cast(x as double) - y) * (cast(x as double) - y))",
        "cast(0.0 as double)",
        "(a, v) -> a + v",
        dual.SPARK,
    )
    scored = (
        F.broadcast(probes)
        .join(cands, "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{adc} AS adc_dist2")
    )
    out = top_k_per_group(
        scored,
        ["query_id"],
        "adc_dist2",
        k=k,
        ascending=True,
        tie_breakers=["cand_id"],
    )
    return _with_cached_deps(out, assigned)


def pq_rerank_topk(
    df: DataFrame,
    query_ids: Sequence[int],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval — the production answer to PQ's recall
    loss: stage 1 shortlists ``shortlist`` candidates per query by
    cheap ADC over the 4-bit codes (:func:`pq_topk`), stage 2 fetches
    ONLY those candidates' raw vectors and re-ranks them by exact
    distance. The expensive exact computation touches
    ``|Q| x shortlist`` rows regardless of corpus size; the corpus-
    wide scan stays on the 64x-compressed codes.

    Recall: rerank can only fix ORDERING within the shortlist, so
    top-k recall is bounded by the shortlist's recall — the shortlist
    factor (default 4x over-fetch) is the knob that buys recall with
    linear, corpus-independent cost (pinned vs brute force in
    tests/test_extensions.py).

    Scale: the stage-2 join keys on the candidate id — a broadcast of
    the kilobyte shortlist against the id-partitioned store, never a
    second corpus scan of raw vectors through the ANN path."""
    short = pq_topk(
        df, query_ids, codebooks, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("query_id", "cand_id")
    queries = df.where(F.col(id_col).isin(*query_ids)).selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS qvec"
    )
    cands = df.selectExpr(f"{id_col} AS cand_id", f"{vec_col} AS cvec")
    d2 = dual.fold(
        "zip_with(qvec, cvec, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double)))",
        "cast(0.0 as double)",
        "(a, v) -> a + v",
        dual.SPARK,
    )
    exact = (
        F.broadcast(short)
        .join(cands, "cand_id")
        .join(F.broadcast(queries), "query_id")
        .selectExpr("query_id", "cand_id", f"{d2} AS dist2")
    )
    return top_k_per_group(
        exact,
        ["query_id"],
        "dist2",
        k=k,
        ascending=True,
        tie_breakers=["cand_id"],
    )


def fit_residual_codebooks(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train PQ codebooks on RESIDUALS (``x - centroid[cell(x)]``)
    instead of raw vectors — the FAISS-style IVF-PQ refinement: after
    the coarse quantizer explains the between-cell variance, the
    residual distribution is tighter than the raw one, so the same
    code budget quantizes it with less error. The artifact DEPENDS on
    the centroids (retrain when they change) — the coupling
    :func:`fit_pq_codebooks` avoids and this accepts for accuracy."""
    d2 = centroid_d2_expr(centroids, vec_col)
    staged = df.selectExpr(
        id_col, vec_col, f"{d2} AS __d2"
    ).selectExpr(id_col, vec_col, f"{CELL_FROM_D2} AS cell")
    res = staged.selectExpr(
        id_col, f"{residual_expr(centroids, vec_col, 'cell')} AS residual"
    )
    return fit_pq_codebooks(
        res, m=m, k=k, id_col=id_col, vec_col="residual", seed=seed
    )


def ann_topk_ivfpq_residual(
    df: DataFrame,
    query_ids: Sequence[int],
    centroids: Sequence[Sequence[float]],
    residual_codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the accuracy refinement
    :func:`ann_topk_ivfpq` documents: candidates store codes of
    ``x - centroid[cell]``, and each query subtracts the PROBED
    cell's centroid before ADC, so
    ``||q - (centroid + recon)||^2 == ||qres - recon||^2`` per cell.
    Same plan shape as the raw-code variant (persisted assignment,
    kilobyte probe broadcast, window-pushed top-k, zero Python); the
    extra cost is one centroid lookup per probe row. The codebooks
    artifact is centroid-DEPENDENT (see
    :func:`fit_residual_codebooks`)."""
    cents = [[float(x) for x in c] for c in centroids]
    n_centroids = len(cents)
    assigned = (
        scatter_small_scan(df)
        .withColumn("__d2", F.expr(centroid_d2_expr(cents, vec_col)))
        .withColumn("cell", F.expr(CELL_FROM_D2))
        .persist()
    )
    cands = (
        assigned.selectExpr(
            f"{id_col} AS cand_id",
            "cell",
            f"{residual_expr(cents, vec_col, 'cell')} AS __res",
        )
        .selectExpr(
            "cand_id",
            "cell",
            f"{pq_d2_expr(residual_codebooks, '__res')} AS __pqd2",
        )
        .selectExpr("cand_id", "cell", f"{PQ_CODE_FROM_D2} AS code")
        .selectExpr(
            "cand_id",
            "cell",
            f"{pq_reconstruct_expr(residual_codebooks, 'code')} AS rres",
        )
    )
    probes = (
        assigned.where(F.col(id_col).isin(*query_ids))
        .selectExpr(f"{id_col} AS query_id", f"{vec_col} AS qvec", "__d2")
        .selectExpr("query_id", "qvec", probe_cells_expr(n_centroids, n_probe))
        .select("query_id", "qvec", F.explode("probe_cells").alias("cell"))
        .selectExpr(
            "query_id",
            "cell",
            f"{residual_expr(cents, 'qvec', 'cell')} AS qres",
        )
    )
    adc = dual.fold(
        "zip_with(qres, rres, (x, y) -> (x - y) * (x - y))",
        "cast(0.0 as double)",
        "(a, v) -> a + v",
        dual.SPARK,
    )
    scored = (
        F.broadcast(probes)
        .join(cands, "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{adc} AS adc_dist2")
    )
    out = top_k_per_group(
        scored,
        ["query_id"],
        "adc_dist2",
        k=k,
        ascending=True,
        tie_breakers=["cand_id"],
    )
    return _with_cached_deps(out, assigned)


def ann_topk_ivfpq_rerank(
    df: DataFrame,
    query_ids: Sequence[int],
    centroids: Sequence[Sequence[float]],
    residual_codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 5,
    shortlist: int = 100,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PRODUCTION ANN operating point — residual IVF-PQ shortlist
    + exact COSINE rerank, the deployed FAISS/Milvus shape: stage 1
    probes ``n_probe`` cells and ADC-ranks their 8-byte residual
    codes down to ``shortlist`` candidates per query
    (:func:`ann_topk_ivfpq_residual`); stage 2 fetches only those
    candidates' raw vectors and reranks by exact cosine.

    Why cosine in stage 2 when the ADC shortlist is L2: rerank runs
    in the SERVING metric. On corpora whose vectors are not
    unit-norm, L2 and cosine top-k genuinely disagree (the recall
    ladder measured the exact-L2 rerank capped at 0.63 recall@5
    against cosine ground truth on the clustered fixture — a metric
    mismatch, not quantization error), while the L2-ADC shortlist is
    still a fine candidate GENERATOR; reranking the same shortlist by
    exact cosine reaches 0.99 (ANN_RECALL.md, floor pinned). Callers
    serving L2 should use :func:`pq_rerank_topk`'s exact-L2 stage.

    Scale: stage 1's corpus-wide work is over 8-byte codes inside the
    probed cells only; stage 2 touches |Q| x shortlist rows — the
    kilobyte shortlist and query frames broadcast against the
    id-keyed store, so the raw-vector corpus is read once and never
    shuffles. Recall@k is bounded by the shortlist's coverage;
    ``shortlist`` (default 20x over-fetch) and ``n_probe`` are the
    two dials. Inherits stage 1's persisted-assignment lifecycle
    (`_with_cached_deps`)."""
    short = ann_topk_ivfpq_residual(
        df,
        query_ids,
        centroids,
        residual_codebooks,
        k=shortlist,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
    )
    deps = getattr(short, "_cached_deps", [])
    nrm = dual.norm(vec_col, dual.SPARK)
    queries = df.where(F.col(id_col).isin(*query_ids)).selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS qvec", f"{nrm} AS qn"
    )
    cands = df.selectExpr(
        f"{id_col} AS cand_id", f"{vec_col} AS cvec", f"{nrm} AS cn"
    )
    cos = dual.cosine_staged("qvec", "cvec", "qn", "cn", dual.SPARK)
    exact = (
        F.broadcast(short.select("query_id", "cand_id"))
        .join(cands, "cand_id")
        .join(F.broadcast(queries), "query_id")
        .selectExpr("query_id", "cand_id", f"{cos} AS cosine")
    )
    out = top_k_per_group(
        exact, ["query_id"], "cosine", k=k, tie_breakers=["cand_id"]
    )
    return _with_cached_deps(out, *deps)


def cell_population_drift(
    base: DataFrame,
    cur: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    smoothing: float = 0.5,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots,
    measured per quantizer cell: assign both snapshots to the PINNED
    centroids and report each cell's Laplace-smoothed population
    share in either snapshot plus its Population-Stability-Index
    contribution ``(p_cur - p_base) * ln(p_cur / p_base)`` — the
    standard monitoring statistic for "did the embedding distribution
    move" (sum of contributions > ~0.2 conventionally flags drift).
    Smoothing keeps cells that empty out in one snapshot finite
    instead of blowing the index to infinity.

    Scale: one codegen'd argmin projection per snapshot, a 16-row
    aggregate each, then a cell-keyed join of two kilobyte frames —
    the monitor costs two column-pruned scans regardless of corpus
    size, so it can run on every snapshot publication."""
    def assigned_cells(df: DataFrame) -> DataFrame:
        d2 = centroid_d2_expr(centroids, vec_col)
        return scatter_small_scan(df).selectExpr(
            f"{d2} AS __d2"
        ).selectExpr(f"{CELL_FROM_D2} AS cell")

    return psi_from_cells(
        assigned_cells(base),
        assigned_cells(cur),
        n_cells=len(centroids),
        smoothing=smoothing,
    )


def psi_from_cells(
    base_cells: DataFrame,
    cur_cells: DataFrame,
    n_cells: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI core over frames that ALREADY carry a ``cell`` column —
    split out of :func:`cell_population_drift` so stores that persist
    the assignment at ingest (``streaming/embed_sink.py`` keeps
    ``cell`` on every admitted row) can monitor drift without ever
    re-deriving it from the vectors."""
    k = int(n_cells)
    s = float(smoothing)

    def counts(df: DataFrame, n_col: str) -> DataFrame:
        return df.groupBy("cell").agg(F.count(F.lit(1)).alias(n_col))

    cells = (
        counts(base_cells, "n_base")
        .join(counts(cur_cells, "n_cur"), "cell", "full_outer")
        .selectExpr(
            "cell",
            "coalesce(n_base, 0) AS n_base",
            "coalesce(n_cur, 0) AS n_cur",
        )
    )
    # Totals as UNPARTITIONED window sums over the <=n_cells-row cell
    # frame — NOT a crossJoin with an aggregate of the same frame:
    # Catalyst re-evaluates a self-referenced subtree per reference,
    # and each psi_from_cells evaluation costs two full corpus scans,
    # so the crossJoin form quietly turned the 2-scan monitor into a
    # 4-scan one (8 with drift_refit_advisory's total on top; caught
    # by tests/test_plans.py::test_drift_advisory_plan_shape). The
    # single-task window is free at quantizer-cell cardinality, and
    # the integer count sums are exact regardless of row order.
    return (
        cells.selectExpr(
            "cell",
            "n_base",
            "n_cur",
            f"(n_base + {s}D) / (sum(n_base) OVER () + {s}D * {k})"
            " AS p_base",
            f"(n_cur + {s}D) / (sum(n_cur) OVER () + {s}D * {k})"
            " AS p_cur",
        )
        .selectExpr(
            "cell",
            "n_base",
            "n_cur",
            "round(p_base, 6) AS share_base",
            "round(p_cur, 6) AS share_cur",
            "round((p_cur - p_base) * ln(p_cur / p_base), 6) AS psi_contrib",
        )
    )


#: PSI interpretation thresholds — the industry-conventional bands:
#: < 0.1 stable, 0.1–0.2 moderate shift (watch), >= 0.2 significant
#: drift (re-fit the quantizer artifacts).
PSI_WATCH = 0.1
PSI_REFIT = 0.2
#: a single cell contributing this much PSI is called out even when
#: the total stays under the watch band (localized drift — one cell
#: emptying/filling — is actionable before the total alarm trips).
PSI_CELL_FLAG = 0.02


def drift_refit_advisory(
    psi: DataFrame,
    watch_threshold: float = PSI_WATCH,
    refit_threshold: float = PSI_REFIT,
    cell_threshold: float = PSI_CELL_FLAG,
) -> DataFrame:
    """Turn a per-cell PSI drift report (:func:`psi_from_cells` /
    :func:`cell_population_drift` output) into a quantizer RE-FIT
    ADVISORY — the lifecycle answer for the repo's pinned-artifact
    design (IVF centroids / PQ codebooks are versioned constants, so
    when the embedding distribution moves the artifacts do not follow
    it; something must say "re-fit and re-pin"). Adds to every cell
    row: ``psi_total`` (the corpus-level index), ``status`` —
    ``refit`` (>= refit_threshold: re-run tools/fit_ivf_centroids.py /
    fit_pq_codebooks.py / fit_residual_codebooks.py on a current
    sample, re-pin, and re-run tools/artifact_gate.py; see
    docs/QUANTIZER_DRIFT_RUNBOOK.md), ``watch`` (>= watch_threshold),
    or ``stable`` — and ``cell_flagged`` for per-cell hotspots.
    ADVISORY ONLY by design: artifacts are never auto-mutated — a
    quantizer that silently re-fits invalidates every stored cell
    assignment and PQ code behind the reader's back.

    Deterministic and exact-oracle-able: psi_contrib arrives rounded
    at 6, the total is a <=n_cells-element sum re-rounded at 6 (the
    addends are multiples of 1e-6 with magnitude <= ~1, so the
    unpartitioned-window sum is order-stable far below the rounding
    grain), the thresholds are literals. Scale: one window sum over a
    kilobyte frame — free at any corpus size, and crucially a SINGLE
    evaluation of the upstream PSI plan (an agg-plus-crossJoin total
    would re-evaluate it, doubling the monitor's corpus scans —
    test_plans.py::test_drift_advisory_plan_shape pins this)."""
    return psi.selectExpr(
        "cell",
        "n_base",
        "n_cur",
        "share_base",
        "share_cur",
        "psi_contrib",
        "round(sum(psi_contrib) OVER (), 6) AS psi_total",
    ).selectExpr(
        "cell",
        "n_base",
        "n_cur",
        "share_base",
        "share_cur",
        "psi_contrib",
        "psi_total",
        f"CASE WHEN psi_total >= {float(refit_threshold)!r}D THEN 'refit'"
        f" WHEN psi_total >= {float(watch_threshold)!r}D THEN 'watch'"
        f" ELSE 'stable' END AS status",
        f"psi_contrib >= {float(cell_threshold)!r}D AS cell_flagged",
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    max_block_size: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold), blocked by ``block_col`` (or the LSH bucket when no
    label exists) so the pair space is bounded per block.

    The within-block all-pairs contract is ENFORCED, not assumed:
    blocks are counted up front (one column-pruned aggregate scan) and
    a block larger than ``max_block_size`` raises instead of silently
    planning an O(n^2) join — a 10M-row block is 50 trillion pairs.
    The remedy is a finer block key (``block_col=None`` switches to
    the 256-way LSH bucket, or compose label+bucket); ``None``
    disables the guard for callers that have pre-validated blocks.
    """
    df = scatter_small_scan(df)
    if block_col is None:
        df = with_bucket(df, vec_col)
        block_col = "bucket"
    _guard_block_sizes(
        df, block_col, max_block_size, "embedding_near_dup_pairs"
    )
    nrm = dual.norm(vec_col, dual.SPARK)
    a = df.selectExpr(
        f"{id_col} AS id_a", f"{vec_col} AS va", f"{nrm} AS na_", f"{block_col} AS blk"
    )
    b = df.selectExpr(
        f"{id_col} AS id_b", f"{vec_col} AS vb", f"{nrm} AS nb_", f"{block_col} AS __blk_b"
    )
    cos = dual.cosine_staged("va", "vb", "na_", "nb_", dual.SPARK)
    return (
        a.join(b, F.col("blk") == F.col("__blk_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .selectExpr("id_a", "id_b", "blk", f"{cos} AS cosine")
        .where(F.col("cosine") >= threshold)
    )

"""Data-layout operators: clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet stores per-row-group min/max statistics, and a scan with a
pushed-down predicate skips every row group whose range excludes the
value. That only pays off if the data is CLUSTERED on the filter
column — random layout makes every row group's range span the whole
domain, so nothing is ever skipped.

``cluster_for_scan`` is the write-side half of that contract:
range-partition on the cluster columns (each output file covers a
disjoint value range) and sort within partitions (row groups inside a
file cover disjoint sub-ranges). A point or range predicate on the
cluster columns then touches one file and a handful of row groups,
regardless of table size. This is the single-dimension version of
what Z-ordering/Liquid clustering do for multi-column predicates;
for one dominant filter column (tenant id, date, user id) it is
optimal and needs no engine extension.

Cost model: one range exchange (sampling pass picks the bounds, AQE
balances skew) + per-partition sort — the same price as any global
sort, paid ONCE at write time, repaid on every subsequent scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def cluster_for_scan(
    df: DataFrame,
    cols: Sequence[str],
    n_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + in-partition sort on ``cols`` so a subsequent
    parquet write produces files with pairwise-disjoint value ranges
    and internally sorted row groups (max min/max pruning for filters
    on ``cols``). Pass the result straight to ``.write.parquet``.

    ``n_partitions`` defaults to Spark's shuffle partition count; set
    it to target a file size (total_bytes / desired_file_bytes) — at
    scale, files of 128-1024 MB keep both the footer count and the
    task count sane.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cluster_for_scan needs at least one column")
    if n_partitions is not None:
        rp = df.repartitionByRange(n_partitions, *cols)
    else:
        rp = df.repartitionByRange(*cols)
    return rp.sortWithinPartitions(*cols)


def z_order_key(col_a: str, col_b: str, bits: int = 16):
    """Z-order (Morton) key for two non-negative integer columns: bit
    i of each input maps to bits 2i / 2i+1 of the key, so sorting by
    the key interleaves locality across BOTH dimensions — range
    clustering on the z-key gives every written file a bounded
    rectangle in (a, b) space, and parquet min/max pruning works for
    predicates on EITHER column (a linear sort only prunes its first
    column). The two-column form generalizes by chaining.

    Inputs are clamped to ``bits`` bits (values beyond 2^bits-1
    saturate, preserving ordering at the top end). Pure JVM bit
    arithmetic — codegen'd, zero shuffle to compute.
    """
    from pyspark.sql import functions as F

    def clamped(c: str):
        return F.least(
            F.greatest(F.col(c).cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )

    a, b = clamped(col_a), clamped(col_b)
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        key = key.bitwiseOR(abit).bitwiseOR(bbit)
    return key


def z_order_cluster(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_partitions: int | None = None,
    bits: int = 16,
) -> DataFrame:
    """Cluster for two-dimensional scan pruning: range-partition +
    sort on the Morton key of (col_a, col_b). Files end up covering
    bounded rectangles in both dimensions, so filters on either
    column prune. The ``__zkey`` column is dropped before write."""
    keyed = df.withColumn("__zkey", z_order_key(col_a, col_b, bits))
    clustered = cluster_for_scan(keyed, ["__zkey"], n_partitions)
    return clustered.drop("__zkey")


def compact_small_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_bytes)`` files. The small-files
    problem is a silent scale killer — a 100 TB table written by
    10k-task jobs accumulates millions of KB-sized files, and every
    subsequent scan pays a per-file open/footer cost that dwarfs the
    data read; NameNode/listing pressure grows the same way.

    Returns the new file count. Uses coalesce (no shuffle — partitions
    are merged, not redistributed); the rewrite goes through a temp
    directory + the same rename-swap as ``atomic_write_partition``, so
    readers never see a half state and a crash mid-swap is recoverable
    from the ``_old`` backup. At production scale run this
    per-partition (year=.../day=...), not on the whole table at once.

    Remote-FS-safe by construction: sizing goes through the Hadoop
    ``FileSystem`` resolved from the path's own scheme (``hdfs://``,
    ``s3a://``, ``file://`` — never ``glob``/``os``), and an empty or
    missing directory RAISES instead of silently computing ``n_out=1``
    (which would otherwise launch a coalesce(1) rewrite of whatever a
    mis-typed path globs to).
    """
    from hadoop_data_pipeline_spark.atomic import swap_directory
    from hadoop_data_pipeline_spark.fs import FS

    fs = FS(spark)
    sizes = [
        (p, n)
        for p, n in fs.list_file_sizes(path, recursive=False)
        if p.endswith(".parquet")
    ]
    if not sizes:
        raise FileNotFoundError(
            f"compact_small_files: no parquet files under {path!r} — "
            "refusing to compact (a remote path typo must not trigger "
            "a full-table coalesce(1) rewrite)"
        )
    total = sum(n for _, n in sizes)
    n_out = max(1, -(-total // target_bytes))
    if n_out >= len(sizes):
        return len(sizes)  # already at/below target: nothing to do
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    try:
        swap_directory(fs, tmp, path.rstrip("/"))
    except Exception:
        fs.delete(tmp)  # never leave a stray tmp behind
        raise
    return sum(
        1
        for p, _ in fs.list_file_sizes(path, recursive=False)
        if p.endswith(".parquet")
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: Sequence[str],
    expected_ndv: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Parquet write with BLOOM FILTERS on ``bloom_cols`` — the point-
    lookup complement to :func:`cluster_for_scan`: min/max pruning
    needs the data clustered on the filter column, but a table can
    only be clustered one way; bloom filters give probabilistic row-
    group skipping for equality predicates on any OTHER high-
    cardinality column (id lookups on a time-clustered table being
    the canonical case) at a few bits per distinct value.

    ``expected_ndv`` sizes the filter (per column, per row group);
    undersizing inflates the false-positive rate toward "never skips".
    Caveat: parquet-mr silently DROPS the bloom filter for columns
    whose pages are all dictionary-encoded (the dictionary already
    gives exact pruning) — blooms only materialize once cardinality
    defeats the dictionary, which is exactly when you need them.
    """
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    w.parquet(path)


def zvalue_expr(
    xcol: str, ycol: str, bits: int = 8, dialect: str = "spark"
) -> str:
    """:func:`z_order_key` as a dialect-portable SQL STRING — the form
    the oracle-checked catalog query (`zorder_bucket_locality`) needs:
    pure integer div/mod with Python-precomputed powers of two, no
    bit-shift builtins, so the identical formula runs on Spark and
    DuckDB. Inputs are masked to ``bits`` via modulo (the Column
    variant above clamps instead — saturating preserves top-end
    ordering for clustering, masking keeps the expression exactly
    mirrorable in SQL; for in-range values the two agree bit-for-bit,
    which tests/test_extensions.py pins)."""
    dv = "div" if dialect == "spark" else "//"
    mask = 2**bits
    terms = []
    for i in range(bits):
        p = 2**i
        terms.append(f"((({xcol} % {mask}) {dv} {p}) % 2) * {4**i}")
        terms.append(f"((({ycol} % {mask}) {dv} {p}) % 2) * {2 * 4**i}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order: every row gets a
    reproducible (shard, shard_rank) position derived ONLY from
    ``(epoch, id)`` — re-running an epoch (crash recovery, ablation
    reruns, multi-worker sharding) reproduces the exact order, and
    different epochs get independent permutations, without ever
    materializing a global sort.

    Why not a global shuffle rank: training order at 100 TB must not
    need a single totally-ordered window (one-task sort). The
    md5-derived key IS the order; it is range-free, so position is
    hierarchical — a worker reads its ``shard`` (hash-pruned), sorts
    the shard-local ``shard_rank`` (embarrassingly parallel,
    ``n_shards`` independent sorts), and streams. The full
    permutation is the concatenation shard 0..n-1.

    Expressible identically in ANSI SQL (md5 + conv), so the order is
    engine-independent — a DuckDB/Trino consumer derives byte-for-byte
    the same epoch order (oracle-checked in the catalog).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.functions import dual

    key = f"md5(concat('ep', cast({epoch} as string), ':', cast({id_col} as string)))"
    shard = f"cast({dual.hex_int(f'substring({key}, 1, 7)', dual.SPARK)} % {n_shards} as int)"
    out = df.selectExpr(
        id_col, f"{shard} AS shard", f"{key} AS __k"
    )
    w = Window.partitionBy("shard").orderBy("__k", id_col)
    return out.select(
        id_col,
        "shard",
        F.row_number().over(w).alias("shard_rank"),
    )

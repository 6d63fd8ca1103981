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
from hadoop_data_pipeline_spark.operators.queries import top_k_per_group


def with_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", F.expr(dual.ann_bucket(vec_col, dual.SPARK)))


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
    bucketed = with_bucket(df, vec_col)
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


def ann_topk_ivf(
    df: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer assigns every vector to
    a centroid cell; each query scores only the cells of its
    ``n_probe`` nearest centroids (~n_probe/n_centroids of the corpus).

    Train/assign uses Spark ML KMeans (seeded — deterministic for
    fixed data). The quantizer trains on a seeded hash-sample capped
    at ``train_cap`` vectors — a coarse quantizer needs only enough
    points to place ``n_centroids`` centers, so at 100 TB training
    never scans the corpus; the cell id is computed once at ingest
    and the probe join hash-partitions on the cell — the classic IVF
    trade: recall for a corpus-fraction's worth of dot products.
    Registered rows-only (a trained quantizer isn't SQL-expressible).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train_cap = max(200 * n_centroids, 1000)
    with_feat = df.withColumn("__feat", array_to_vector(F.col(vec_col)))
    # Deterministic sample: hash the id, keep the smallest-bucket rows.
    # limit() after the hash-order sort keeps the sample identical as
    # the corpus grows at the margin (pure sample(fraction) would need
    # a count() pass to size the fraction).
    train = (
        with_feat.select(
            id_col, "__feat", F.crc32(F.col(id_col).cast("string")).alias("__r")
        )
        .orderBy("__r", id_col)
        .limit(train_cap)
        .select("__feat")
    )
    km = (
        KMeans(k=n_centroids, seed=42, maxIter=10, featuresCol="__feat")
        .fit(train)
    )
    assigned = (
        km.transform(with_feat)
        .withColumnRenamed("prediction", "cell")
        .drop("__feat")
        .persist()
    )
    # Distance of a vector to every centroid as one expression array;
    # the query side probes the n_probe smallest.
    cents = [[float(x) for x in c] for c in km.clusterCenters()]
    d2 = ", ".join(
        "aggregate(zip_with(%s, array(%s), (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), cast(0.0 as double), (a, v) -> a + v)"
        % (vec_col, ", ".join(str(v) for v in c))
        for c in cents
    )
    probes = (
        assigned.where(F.col(id_col).isin(*query_ids))
        .selectExpr(
            f"{id_col} AS query_id",
            f"{vec_col} AS qvec",
            f"{dual.norm(vec_col, dual.SPARK)} AS qn",
            f"array({d2}) AS __d2",
        )
        .selectExpr(
            "query_id",
            "qvec",
            "qn",
            f"""transform(
                slice(array_sort(zip_with(__d2, sequence(0, {n_centroids - 1}),
                      (d, i) -> struct(d AS d, i AS i))), 1, {n_probe}),
                s -> s.i) AS probe_cells""",
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
    return top_k_per_group(
        scored, ["query_id"], "cosine", k=k, tie_breakers=["cand_id"]
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
    if block_col is None:
        df = with_bucket(df, vec_col)
        block_col = "bucket"
    if max_block_size is not None:
        oversized = (
            df.groupBy(block_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_block_size)
            .limit(3)
            .collect()
        )
        if oversized:
            worst = ", ".join(
                f"{r[block_col]}={r['__n']}" for r in oversized
            )
            raise ValueError(
                f"embedding_near_dup_pairs: block(s) exceed "
                f"max_block_size={max_block_size} ({worst}); use a finer "
                f"block key (e.g. block_col=None for LSH buckets) or "
                f"raise the bound explicitly"
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

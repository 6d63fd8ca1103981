"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

A single sort key gives range-pruning on one column only; interleaving
the bits of TWO bucketized keys into a Z-value makes files/row-groups
simultaneously narrow in BOTH dimensions, so min-max (zone-map) stats
prune scans for predicates on either column — the lakehouse layout
trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``) expressed as plain
Catalyst arithmetic + ``repartitionByRange``.

Everything here is pure integer arithmetic with Python-precomputed
powers of two — no bit-shift builtins — so the SAME formula runs on
Spark and DuckDB (the catalog query's oracle) and stays inside
whole-stage codegen.

Scale: computing z is a projection; laying data out is ONE range
shuffle on z (the same cost as any sorted write) and buys every later
scan two-dimensional pruning. At 100 TB this is an ingest-time or
compaction-time job, never a query-time one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.functions import dual


def zvalue_expr(
    xcol: str, ycol: str, bits: int = 8, dialect: str = dual.SPARK
) -> str:
    """Morton interleave of two non-negative ints bucketized to
    ``bits`` bits each: bit ``i`` of x lands at position ``2i``, bit
    ``i`` of y at ``2i + 1``. Inputs are masked to ``bits`` via
    modulo, so callers can pass raw keys. Dialect-portable: integer
    div/mod with precomputed constants only."""
    dv = "div" if dialect == dual.SPARK else "//"
    mask = 2**bits
    terms = []
    for i in range(bits):
        p = 2**i
        terms.append(f"((({xcol} % {mask}) {dv} {p}) % 2) * {4**i}")
        terms.append(f"((({ycol} % {mask}) {dv} {p}) % 2) * {2 * 4**i}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of
    ``(xcol, ycol)``: one range shuffle on the z-value, sorted within
    partitions, so each output file covers a narrow z-range — and
    therefore a narrow rectangle in (x, y) — giving zone-map pruning
    on BOTH columns. The ``__z`` column is dropped before writing
    (layout metadata, not data)."""
    with_z = df.withColumn(
        "__z", F.expr(zvalue_expr(xcol, ycol, bits, dual.SPARK))
    )
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet fixtures, then
compares row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [--strict] [sf_dir] [query ...]

``--strict`` hashes dtype-faithfully like the round driver (no
int-valued-float bridging) — the gate runs this mode; the default
lenient mode remains for quick eyeballing of value-level diffs.
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(df: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    """Dtype-aware vectorized canonicalization. The only contract is
    SYMMETRY — both engines' frames pass through the identical
    transform — plus (in the DEFAULT lenient mode) dtype-insensitivity
    for numbers (DuckDB may hand back int64 where Spark hands float64
    for the same values). The per-element fallback survives only for
    object columns (decimals, bytes, arrays); a 4.8M x 17 frame
    canonicalizes in seconds instead of minutes (the 8x stress sweep
    spent 427 s in the old elementwise map for one projection query).

    ``strict=True`` is the DRIVER-FAITHFUL mode (round-7 fix for the
    r6 driver reds): the driver's hasher is dtype-sensitive — a DuckDB
    HUGEINT sum materialized as float64 ``5.0`` hashes differently
    from Spark's int64 ``5`` — so strict mode never bridges int-valued
    floats to int repr. A float64 column canonicalizes as float repr,
    an int column as int repr, and a dtype mismatch between the
    engines therefore FAILS here exactly as it fails in the driver."""
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ""
        if isinstance(v, float):
            if not strict and v == int(v) and abs(v) < 1e15:
                return repr(int(v))
            return repr(round(v, 9))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    cols = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # NOTE: never Series.round(9) here — numpy's scale-by-1e9
            # rounding corrupts large exact values (12692380641200.0
            # -> ...200.002); Python's round() is correctly rounded,
            # and the int-valued test runs on the RAW values exactly
            # like the original elementwise norm did.
            vals = s.astype("float64").to_numpy()
            isnum = np.isfinite(vals)
            if strict:
                isint = np.zeros(len(vals), dtype=bool)
            else:
                isint = (
                    isnum & (np.floor(vals) == vals) & (np.abs(vals) < 1e15)
                )
            out = np.full(len(vals), "", dtype=object)
            out[isint] = [repr(int(v)) for v in vals[isint]]
            rest = isnum & ~isint
            out[rest] = [repr(round(float(v), 9)) for v in vals[rest]]
            isinf = np.isinf(vals)
            out[isinf] = [repr(float(v)) for v in vals[isinf]]
            cols[c] = out
        elif pd.api.types.is_integer_dtype(s):
            # int-valued must canonicalize like int-valued floats
            out = s.astype("Int64").astype(str).to_numpy(dtype=object)
            out[s.isna().to_numpy()] = ""
            cols[c] = out
        elif pd.api.types.is_bool_dtype(s) and not s.isna().any():
            cols[c] = s.astype(str).to_numpy(dtype=object)
        else:
            cols[c] = s.map(norm).to_numpy(dtype=object)
    out = pd.DataFrame(cols, columns=list(df.columns))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare_bounded(spark_df, duck_df, rel_tol: float) -> list[str]:
    """Tolerance compare for sketch-valued queries: key (non-numeric)
    columns must align exactly; numeric columns must sit within
    ``rel_tol`` relative error of the oracle's exact values."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [
            f"schema mismatch: spark={sorted(spark_df.columns)} "
            f"duck={sorted(duck_df.columns)}"
        ]
    if len(spark_df) != len(duck_df):
        return [f"row count: spark={len(spark_df)} duck={len(duck_df)}"]
    num_cols = [
        c for c in spark_df.columns
        if pd.api.types.is_numeric_dtype(duck_df[c])
    ]
    key_cols = [c for c in spark_df.columns if c not in num_cols]
    a = spark_df.sort_values(key_cols).reset_index(drop=True)
    b = duck_df.sort_values(key_cols).reset_index(drop=True)
    for c in key_cols:
        if not a[c].astype(str).equals(b[c].astype(str)):
            problems.append(f"key column {c} differs")
    if key_cols and b.duplicated(subset=key_cols).any():
        # Positional compare after a key sort is only sound when the
        # key columns identify rows uniquely (ADVICE r6).
        problems.append(f"duplicate key rows on {key_cols}")
        return problems
    for c in num_cols:
        exact = b[c].astype(float)
        est = a[c].astype(float)
        if not est.isna().equals(exact.isna()):
            # NaN estimates must not pass silently: (est-exact) is NaN
            # and Series.max() skips it, so rel>tol would be False.
            problems.append(f"{c}: NaN pattern differs from oracle")
            continue
        if c.startswith("exact_"):
            # Companion ground-truth columns must agree EXACTLY —
            # only sketch estimates get the tolerance (a 5% drift in
            # an exact count is a bug the tolerance would mask).
            if not est.equals(exact):
                problems.append(f"exact column {c} differs")
            continue
        rel = ((est - exact).abs() / exact.abs().clip(lower=1.0)).max()
        if rel > rel_tol:
            problems.append(
                f"{c}: max relative error {rel:.4f} > tol {rel_tol}"
            )
    return problems


def compare(spark_df, duck_df, strict: bool = False) -> list[str]:
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = _canon(spark_df, strict), _canon(duck_df, strict)
    if len(a) == len(b) and not a.equals(b):
        diff = (a != b).any(axis=1)
        idx = diff[diff].index[:3]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}")
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    unknown = [a for a in argv if a.startswith("-")]
    if unknown:
        # a typo'd flag must not be silently consumed as sf_dir or a
        # query-name filter (ADVICE r7)
        print(f"unknown option(s): {' '.join(unknown)}", file=sys.stderr)
        print(
            "usage: python tools/oracle_check.py [--strict] [sf_dir]"
            " [query ...]",
            file=sys.stderr,
        )
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    bounds = getattr(e, "bound_oracle_sql", dict)()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        # Several catalog pipelines persist bounded intermediate
        # frames whose lifetime is the lazy result (triangle
        # orientation, association-rule baskets, perceptron doc x
        # feature matrix, ...). The query functions cannot unpersist
        # them — the caller materializes the result — so the DRIVER
        # seat releases them here, once the previous query's hash is
        # done, keeping a long 170-query sweep's executor memory flat
        # (ADVICE r12).
        spark.catalog.clearCache()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            if name in bounds:
                spec = bounds[name]
                try:
                    bdf = con.execute(spec["sql"]).df()
                except Exception as ex:  # noqa: BLE001
                    print(f"FAIL  {name}: duckdb raised {ex}")
                    failed.append(name)
                    continue
                problems = compare_bounded(sdf, bdf, spec["rel_tol"])
                if problems:
                    print(f"FAIL  {name}: " + "; ".join(problems))
                    failed.append(name)
                else:
                    print(
                        f"BOUND {name}: rows={len(sdf)} within "
                        f"rel_tol={spec['rel_tol']}"
                    )
                continue
            print(f"okay  {name}: rows={len(sdf)} (no oracle — rows-only check)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {ex}")
            failed.append(name)
            continue
        problems = compare(sdf, ddf, strict)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"MATCH {name}: rows={len(sdf)}")
    mode = "strict" if strict else "lenient"
    print(f"\n{n_run - len(failed)}/{n_run} pass ({mode})")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

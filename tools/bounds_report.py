"""Committed evidence for the catalog entries the external driver
records as ``no_oracle``.

Four catalog queries have no exact DuckDB oracle: the three sketch
estimators (``approx_distinct_users_per_type``,
``approx_percentile_value_by_type``, ``incremental_distinct_users_hll``
— bound oracles: exact ground-truth SQL plus a relative-error
envelope) and ``bpe_tokenize_docs`` (an iterative trainer with no SQL
form — invariant checks instead). Those checks already run locally in
``tools/oracle_check.py`` / pytest, but the driver's
``CORRECTNESS_r{N}.json`` shows a bare ``no_oracle`` with no attached
verdict. This tool closes that gap: it executes the bound/invariant
checks and writes the VERDICTS to a committed per-round artifact
(``BOUNDS_r{N}.json``), so every ``no_oracle`` driver row carries
adjacent, inspectable evidence.

Per bound-oracle entry: rows, the envelope (``rel_tol``), the
OBSERVED max relative error per estimate column, and pass/fail.
Per BPE entry: the invariant battery — row count matches the corpus,
re-run determinism, encode round-trip on a sample, and compression
sanity — each with its own verdict.

Usage: python tools/bounds_report.py [sf_dir] [out.json]
Defaults: /root/testdata/sf0.01, BOUNDS.json. Exit 0 iff all pass.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def bound_entry(spark, con, name, fn, spec, sf_dir) -> dict:
    """One sketch query: observed max relative error per estimate
    column vs the exact ground-truth SQL, compared to the envelope."""
    sdf = fn(spark, sf_dir).toPandas()
    bdf = con.execute(spec["sql"]).df()
    rel_tol = float(spec["rel_tol"])
    if sorted(sdf.columns) != sorted(bdf.columns):
        # Schema drift between the Spark query and its ground-truth
        # SQL must land as a recorded pass:false verdict, not a
        # KeyError crash of the whole report (ADVICE r11).
        return {
            "kind": "bound_oracle",
            "rows": int(len(sdf)),
            "rel_tol": rel_tol,
            "max_rel_err": {},
            "pass": False,
            "err": (
                f"schema mismatch: spark={sorted(sdf.columns)} "
                f"oracle={sorted(bdf.columns)}"
            ),
        }
    num_cols = [
        c for c in sdf.columns if pd.api.types.is_numeric_dtype(bdf[c])
    ]
    key_cols = [c for c in sdf.columns if c not in num_cols]
    a = sdf.sort_values(key_cols).reset_index(drop=True)
    b = bdf.sort_values(key_cols).reset_index(drop=True)
    errs: dict[str, float] = {}
    ok = sorted(sdf.columns) == sorted(bdf.columns) and len(a) == len(b)
    if ok:
        for c in key_cols:
            ok = ok and a[c].astype(str).equals(b[c].astype(str))
        for c in num_cols:
            exact = b[c].astype(float)
            est = a[c].astype(float)
            if c.startswith("exact_"):
                ok = ok and est.equals(exact)
                continue
            rel = float(
                ((est - exact).abs() / exact.abs().clip(lower=1.0)).max()
            )
            errs[c] = round(rel, 6)
            ok = ok and rel <= rel_tol
    return {
        "kind": "bound_oracle",
        "rows": int(len(sdf)),
        "rel_tol": rel_tol,
        "max_rel_err": errs,
        "pass": bool(ok),
    }


def bpe_entry(spark, sf_dir) -> dict:
    """Invariant battery for the rows-only BPE entry."""
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.operators import tokenizer as tok
    from hadoop_data_pipeline_spark.sources.readers import load_table

    fn = qc.QUERIES["bpe_tokenize_docs"]
    out1 = fn(spark, sf_dir).toPandas().sort_values("doc_id")
    out2 = fn(spark, sf_dir).toPandas().sort_values("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    checks = {
        "row_count_matches_docs": int(len(out1)) == int(n_docs),
        "deterministic_rerun": out1.reset_index(drop=True).equals(
            out2.reset_index(drop=True)
        ),
        # every doc got at least one token and the learned vocab
        # compresses: tokens never outnumber characters
        "tokens_positive": bool((out1["n_tokens"] >= 1).all()),
        "chars_per_token_positive": bool(
            (out1["chars_per_token"] > 0).all()
        ),
    }
    # encode round-trip on a deterministic sample: tokens concatenate
    # back to the source words (EOW marks word ends) under the SAME
    # corpus-trained merge table the catalog query uses
    merges = tok.bpe_train(
        tok.word_frequencies(docs, max_vocab=20_000), n_merges=64, min_freq=2
    )
    sample = docs.orderBy("doc_id").limit(20)
    enc = tok.bpe_encode(sample, merges).join(
        sample.select("doc_id", "text"), "doc_id"
    )
    bad = enc.where(
        F.expr(
            "trim(replace(concat_ws('', tokens), '%s', ' ')) "
            "!= trim(regexp_replace(text, '[ ]+', ' '))" % tok.EOW
        )
    ).count()
    checks["roundtrip_sample_20"] = int(bad) == 0
    return {
        "kind": "invariants",
        "rows": int(len(out1)),
        "checks": checks,
        "pass": all(checks.values()),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BOUNDS.json"

    import __spark_entry__ as e
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("bounds_report")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    bounds = e.bound_oracle_sql()
    entries: dict[str, dict] = {}
    for name, spec in sorted(bounds.items()):
        entries[name] = bound_entry(spark, con, name, qs[name], spec, sf_dir)
        print(
            f"{'PASS' if entries[name]['pass'] else 'FAIL'}  {name}: "
            f"max_rel_err={entries[name]['max_rel_err']} "
            f"(tol={entries[name]['rel_tol']})"
        )
    entries["bpe_tokenize_docs"] = bpe_entry(spark, sf_dir)
    print(
        f"{'PASS' if entries['bpe_tokenize_docs']['pass'] else 'FAIL'}  "
        f"bpe_tokenize_docs: {entries['bpe_tokenize_docs']['checks']}"
    )

    all_pass = all(v["pass"] for v in entries.values())
    payload = {
        "sf_dir": sf_dir,
        "generated_at": datetime.datetime.now(
            datetime.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "entries": entries,
        "all_pass": all_pass,
    }
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2)
        fh.write("\n")
    print(f"{'ALL PASS' if all_pass else 'FAILED'} -> {out_path}")
    return 0 if all_pass else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Learned quality filter (operators/learn.py): the batch perceptron
must match an INDEPENDENT pure-Python reference bit-for-bit (the
integer-exactness contract that makes the unrolled-epoch SQL oracle
possible), and its physical plan must keep the one-scan /
one-repartition / no-extra-exchange shape the docstrings claim."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pandas as pd
import pytest

from hadoop_data_pipeline_spark.operators import learn

SF = "/root/testdata/sf0.001"


def _ref_train(texts, ids, epochs=3, nf=64):
    """Independent reference: plain-Python batch perceptron with the
    same hashing, labels and update rule — no Spark, no SQL."""
    X, Y = {}, {}
    for i, t in zip(ids, texts):
        toks = re.split(r"\s+", t.strip())
        Y[i] = 1 if 2 * len(set(toks)) > len(toks) else -1
        cnt: dict[int, int] = {}
        for tok in toks:
            f = int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % nf
            cnt[f] = cnt.get(f, 0) + 1
        X[i] = cnt
    w: dict[int, int] = {}
    b = 0
    for _ in range(epochs):
        mis = [
            i
            for i in X
            if Y[i]
            * (sum(c * w.get(f, 0) for f, c in X[i].items()) + b)
            <= 0
        ]
        for i in mis:
            for f, c in X[i].items():
                w[f] = w.get(f, 0) + Y[i] * c
            b += Y[i]
    return X, Y, w, b


@pytest.fixture(scope="module")
def fixture_docs():
    df = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).df()
    return df


def test_weights_match_pure_python_reference(spark, fixture_docs):
    X, Y, w, b = _ref_train(fixture_docs.text, fixture_docs.doc_id)
    got = (
        learn.perceptron_weights(spark.read.parquet(f"{SF}/documents.parquet"))
        .toPandas()
        .sort_values("f")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        sorted(w.items()) + [(-1, b)], columns=["f", "w"]
    ).sort_values("f").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_scores_match_pure_python_reference(spark, fixture_docs):
    X, Y, w, b = _ref_train(fixture_docs.text, fixture_docs.doc_id)
    got = (
        learn.perceptron_doc_scores(
            spark.read.parquet(f"{SF}/documents.parquet")
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rows = []
    for i in sorted(X):
        s = sum(c * w.get(f, 0) for f, c in X[i].items()) + b
        rows.append((i, Y[i], s, 1 if s > 0 else -1))
    want = pd.DataFrame(
        rows, columns=["doc_id", "y", "score", "predicted"]
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_scores_plan_shape(spark):
    """One parquet scan, the one intended repartition, and NO other
    exchange anywhere — the final per-doc aggregate must reuse the
    staged matrix's doc_id partitioning (an ENSURE_REQUIREMENTS
    exchange appearing here means the alignment contract broke)."""
    df = learn.perceptron_doc_scores(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ENSURE_REQUIREMENTS" not in plan
    head = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in head, "final scoring pass must not shuffle"
    fmt = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    locs = {
        ln.strip()
        for ln in fmt.splitlines()
        if ln.strip().startswith("Location:")
    }
    assert len(locs) == 1, f"expected one scanned location, got {locs}"


def test_oracle_sql_weights_and_scores_agree_with_spark(spark):
    """End-to-end dual-dialect check at sf0.001 (the catalog gate runs
    sf0.01; this pins the oracle generator itself in the unit suite)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    ow = (
        con.sql(learn.perceptron_oracle_sql(learn.dual.DUCK, output="weights"))
        .df()
        .sort_values("f")
        .reset_index(drop=True)
    )
    sw = (
        learn.perceptron_weights(spark.read.parquet(f"{SF}/documents.parquet"))
        .toPandas()
        .sort_values("f")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sw.astype("int64"), ow.astype("int64"))

"""Python UDTF extension surface (SURVEY.md §2.11): the lateral-join
table function must reproduce the JVM chunker's rows exactly, so the
slow extension path and the codegen'd built-in path are semantically
interchangeable."""

from __future__ import annotations

from hadoop_data_pipeline_spark.operators import curation, udtf_ops
from tests.conftest import SF_SMALL


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 50")  # pushdown filter, not limit: no exchange
    )


def test_udtf_matches_jvm_chunker(spark):
    docs = _docs(spark)
    docs.createOrReplaceTempView("udtf_docs")
    udtf_ops.register_udtfs(spark)

    via_udtf = spark.sql(
        """
        SELECT c.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_md5
        FROM udtf_docs d, LATERAL chunk_docs_udtf(d.doc_id, d.text) c
        """
    )
    via_jvm = curation.chunk_docs(docs)

    key = ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_md5"]
    a = sorted(tuple(r) for r in via_udtf.select(*key).collect())
    b = sorted(tuple(r) for r in via_jvm.select(*key).collect())
    assert a == b
    assert len(a) > 50  # documents actually expanded


def test_udtf_lateral_plan_no_shuffle(spark):
    # the lateral UDTF call is a per-partition pipe: no exchange may
    # appear — expansion happens where the rows already live.
    docs = _docs(spark)
    docs.createOrReplaceTempView("udtf_docs_plan")
    udtf_ops.register_udtfs(spark)
    df = spark.sql(
        """
        SELECT c.* FROM udtf_docs_plan d,
        LATERAL chunk_docs_udtf(d.doc_id, d.text) c
        """
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "UDTF" in plan or "Python" in plan

"""Property-based check of the dual-dialect exactness claim
(functions/dual.py): for arbitrary unicode text, the Spark expressions
and the DuckDB expressions generated from the same builders produce
IDENTICAL values — tokens, shingle hashes, minhash, simhash, rolling
fingerprint. This is the foundation every extension oracle rests on;
hypothesis probes the edges the fixtures don't (empty strings,
whitespace-only, regex metacharacters, mixed scripts)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_data_pipeline_spark.functions import dual

ALPHABET = (
    "abcXYZ019 \t\n"
    "กขคงจฉ"   # Thai
    "äöüß"      # Latin-1 accents
    "中文字"     # CJK
    ".,!?-_()[]{}*+\\^$|'\""  # regex metacharacters + quotes
)

texts_strategy = st.lists(
    st.text(alphabet=ALPHABET, max_size=60), min_size=1, max_size=16
)


def _spark_results(spark, pdf: pd.DataFrame) -> list[tuple]:
    df = spark.createDataFrame(pdf)
    staged = dual.stage_spark_token_hashes(df, "text", ["i"])
    tok = staged.selectExpr(
        "i",
        f"{dual.arr_size('__th', dual.SPARK)} AS n_tokens",
        f"{dual.fingerprint_from_hashes('__th', dual.SPARK)} AS fp",
        f"{dual.simhash_from_hashes('__th', dual.SPARK)} AS sh",
    )
    sh = dual.stage_spark_shingle_hashes(df, "text", ["i"]).selectExpr(
        "i", f"{dual.minhash_from_hashes('__sh', 0, dual.SPARK)} AS mh0"
    )
    rows = {r["i"]: r for r in tok.collect()}
    for r in sh.collect():
        rows[r["i"]] = (*_row(rows[r["i"]]), r["mh0"])
    return sorted(rows.values())


def _row(r) -> tuple:
    return (r["i"], r["n_tokens"], r["fp"], r["sh"])


def _duck_results(pdf: pd.DataFrame) -> list[tuple]:
    con = duckdb.connect()
    con.register("docs", pdf)
    d = dual.DUCK
    tok = con.execute(
        f"""
        WITH {dual.duck_token_hash_cte('docs', 'text', ['i'])}
        SELECT i, {dual.arr_size('h', d)} AS n_tokens,
               {dual.fingerprint_from_hashes('h', d)} AS fp,
               {dual.simhash_from_hashes('h', d)} AS sh
        FROM th ORDER BY i
        """
    ).fetchall()
    mh = con.execute(
        f"""
        WITH {dual.duck_shingle_hash_cte('docs', 'text', ['i'])}
        SELECT i, {dual.minhash_from_hashes('sh', 0, d)} AS mh0
        FROM h ORDER BY i
        """
    ).fetchall()
    mh_by_i = {r[0]: r[1] for r in mh}
    return sorted((*t, mh_by_i[t[0]]) for t in tok)


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_strategy)
def test_dual_text_exprs_engine_exact(spark, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    assert _spark_results(spark, pdf) == _duck_results(pdf)


vec_strategy = st.lists(
    st.lists(
        st.integers(min_value=-1000, max_value=1000).map(lambda i: i / 100.0),
        min_size=8,
        max_size=8,
    ),
    min_size=2,
    max_size=10,
)


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=vec_strategy)
def test_dual_cosine_engine_exact(spark, vecs):
    """Cosine (incl. staged-norm form) and LSH bucket ids are
    bit-identical across engines for arbitrary small vectors."""
    import duckdb as ddb

    pdf = pd.DataFrame({"i": range(len(vecs)), "v": vecs})
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "i bigint, v array<double>",
    )
    nrm = dual.norm("v", dual.SPARK)
    a = df.selectExpr("i AS ia", "v AS va", f"{nrm} AS na")
    b = df.selectExpr("i AS ib", "v AS vb", f"{nrm} AS nb")
    spark_rows = sorted(
        (r["ia"], r["ib"], r["c"])
        for r in a.crossJoin(b)
        .where("ia < ib AND na > 0 AND nb > 0")
        .selectExpr(
            "ia", "ib",
            f"{dual.cosine_staged('va', 'vb', 'na', 'nb', dual.SPARK)} AS c",
        )
        .collect()
    )
    con = ddb.connect()
    con.register("vecs", pdf)
    d = dual.DUCK
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT a.i, b.i, {dual.cosine('a.v', 'b.v', d)}
            FROM vecs a JOIN vecs b ON a.i < b.i
            WHERE {dual.norm('a.v', d)} > 0 AND {dual.norm('b.v', d)} > 0
            """
        ).fetchall()
    )
    assert spark_rows == duck_rows


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_strategy)
def test_dual_ordered_distinct_engine_exact(spark, texts):
    """ordered_distinct keeps first occurrences in order identically
    in both engines — the foundation of the within_doc_dedup oracle
    (DuckDB's list_distinct does NOT guarantee order, which is why the
    mirrored index-lambda form exists)."""
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    staged = df.selectExpr("i", f"{dual.tokens('text', dual.SPARK)} AS t")
    sres = sorted(
        (r["i"], list(r["u"]))
        for r in staged.selectExpr(
            "i", f"{dual.ordered_distinct('t', dual.SPARK)} AS u"
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    d = dual.DUCK
    dres = sorted(
        (r[0], list(r[1]))
        for r in con.execute(
            f"WITH t AS (SELECT i, {dual.tokens('text', d)} AS t FROM docs) "
            f"SELECT i, {dual.ordered_distinct('t', d)} AS u FROM t"
        ).fetchall()
    )
    assert sres == dres


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_strategy)
def test_dual_chunk_exprs_engine_exact(spark, texts):
    """Overlapping-chunk construction (curation.chunk_exprs) yields the
    identical (chunk_id, token count, md5) sets in both engines for
    arbitrary unicode text, including empty/whitespace-only docs."""
    from hadoop_data_pipeline_spark.operators import curation as cur

    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    chunk, stride = 5, 3

    sdf = spark.createDataFrame(pdf).selectExpr(
        "i", f"{dual.tokens('text', dual.SPARK)} AS __tk"
    )
    n_chunks, count, md5 = cur.chunk_exprs("__tk", dual.SPARK, chunk, stride)
    idx = dual.index_range("0", f"({n_chunks}) - 1", dual.SPARK)
    got_spark = sorted(
        (r["i"], r["chunk_id"], r["n"], r["m"])
        for r in sdf.selectExpr("i", "__tk", f"explode({idx}) AS chunk_id")
        .selectExpr("i", "chunk_id", f"{count} AS n", f"{md5} AS m")
        .collect()
    )

    con = duckdb.connect()
    con.register("docs", pdf)
    d = dual.DUCK
    n_chunks_d, count_d, md5_d = cur.chunk_exprs("tk", d, chunk, stride)
    idx_d = dual.index_range("0", f"({n_chunks_d}) - 1", d)
    got_duck = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH t AS (SELECT i, {dual.tokens('text', d)} AS tk FROM docs),
            e AS (SELECT i, tk, unnest({idx_d}) AS chunk_id FROM t)
            SELECT i, chunk_id, {count_d} AS n, {md5_d} AS m FROM e
            """
        ).fetchall()
    )
    assert got_spark == got_duck


ids_weights_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),
        st.integers(min_value=1, max_value=10**6),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ids_weights_strategy)
def test_dual_es_key_engine_exact(spark, rows):
    """Efraimidis-Spirakis sampling keys (curation.es_key_expr) are
    identical across engines for arbitrary ids and weights — the
    property the weighted_sample oracle rests on."""
    from hadoop_data_pipeline_spark.operators import curation as cur

    pdf = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "w": [r[1] for r in rows]}
    )
    key_s = cur.es_key_expr("doc_id", "w", "pt-v1", dual.SPARK)
    got_spark = sorted(
        (r["doc_id"], r["k"])
        for r in spark.createDataFrame(pdf)
        .selectExpr("doc_id", f"{key_s} AS k")
        .collect()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    key_d = cur.es_key_expr("doc_id", "w", "pt-v1", dual.DUCK)
    got_duck = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, {key_d} AS k FROM docs"
        ).fetchall()
    )
    assert got_spark == got_duck

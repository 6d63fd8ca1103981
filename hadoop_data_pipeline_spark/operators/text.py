"""Text-analysis operators for a training-data pipeline (north-star
extension, BASELINE.json): language ID, quality scoring, token
counting, document fingerprinting — all as JVM-side Catalyst
expressions (no Python UDFs in the hot path), each with a DuckDB
oracle generated from the same dual-dialect expressions.

All operators follow dual.py's STAGING RULE: the token array is
materialized once per row in a first projection, and every downstream
expression references that column — never re-tokenizes.

At 100 TB these are embarrassingly parallel projections: zero
shuffles, full whole-stage codegen, and the parquet reader prunes to
the text column only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.functions import dual

#: Tiny deterministic stopword marker sets per language. This is a
#: heuristic marker-word lang-ID (the container has no langdetect);
#: the *operator contract* — argmax over per-language marker counts
#: with a fixed tie-break order — is what matters and is oracle-checked.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "it", "on", "for")


def _in_list(var: str, words: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"{var} IN ({quoted})"


def marker_count_expr(toks_col: str, dialect: str, words: tuple[str, ...]) -> str:
    """Count of tokens (from a staged tokens column) in a marker set."""
    return dual.arr_size(
        dual.arr_filter(toks_col, f"t -> {_in_list('t', words)}", dialect), dialect
    )


def lang_id_case_expr(count_cols: dict[str, str]) -> str:
    """Argmax CASE over staged per-language count columns, ties broken
    by dict order; 'und' when no marker hits. Dialect-neutral."""
    names = list(count_cols)
    whens = []
    for i, lang in enumerate(names):
        c = count_cols[lang]
        cond = f"{c} > 0"
        for j, other in enumerate(names):
            if j < i:
                cond += f" AND {c} > {count_cols[other]}"
            elif j > i:
                cond += f" AND {c} >= {count_cols[other]}"
        whens.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def quality_score_expr(col: str, toks_col: str, dialect: str) -> str:
    """Composite quality score in [0,1] from the raw text column and a
    staged tokens column:
    0.4 * min(n_tokens/200, 1)                    (length)
    + 0.3 * min(stopword_fraction * 5, 1)         (natural-language-ness)
    + 0.3 * (1 - punctuation char ratio)          (cleanliness)
    Same arithmetic order in both dialects; rounded to 6 decimals."""
    n_tok = f"cast({dual.arr_size(toks_col, dialect)} as double)"
    n_stop = f"cast({marker_count_expr(toks_col, dialect, STOPWORDS)} as double)"
    n_chars = f"cast(length({col}) as double)"
    flags = ", 'g'" if dialect == dual.DUCK else ""
    n_punct = f"cast(length(regexp_replace({col}, '[^.!?,;:]', ''{flags})) as double)"
    return (
        f"round(0.4 * least({n_tok} / 200.0, 1.0)"
        f" + 0.3 * least(({n_stop} / greatest({n_tok}, 1.0)) * 5.0, 1.0)"
        f" + 0.3 * (1.0 - {n_punct} / greatest({n_chars}, 1.0)), 6)"
    )


def token_stats_exprs(col: str, toks_col: str, dialect: str) -> dict[str, str]:
    """n_tokens / BPE-ish subtoken count / average token length."""
    n_tok = dual.arr_size(toks_col, dialect)
    if dialect == dual.SPARK:
        bpe = f"size(regexp_extract_all({col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
    else:
        bpe = f"len(regexp_extract_all({col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))"
    avg_len = (
        f"round(cast(length(replace({col}, ' ', '')) as double)"
        f" / greatest(cast({n_tok} as double), 1.0), 6)"
    )
    return {"n_tokens": n_tok, "n_subtokens": bpe, "avg_token_len": avg_len}


# ---------------------------------------------------------------------------
# Spark DataFrame operators (staged)
# ---------------------------------------------------------------------------


def _with_tokens(df: DataFrame, col: str, keep: list[str]) -> DataFrame:
    # Scatter before the tokenize projection — the family's expensive
    # per-row stage; no-op at production split counts (see
    # queries.scatter_small_scan). Downstream consumers aggregate
    # counts/mins or stay per-row, so partitioning order is immaterial.
    from hadoop_data_pipeline_spark.operators.queries import (
        scatter_small_scan,
    )

    return scatter_small_scan(df).selectExpr(
        *keep, col, f"{dual.tokens(col, dual.SPARK)} AS __toks"
    )


def token_stats(df: DataFrame, col: str = "text") -> DataFrame:
    staged = _with_tokens(df, col, ["doc_id"])
    ex = token_stats_exprs(col, "__toks", dual.SPARK)
    return staged.selectExpr(
        "doc_id",
        f"{ex['n_tokens']} AS n_tokens",
        f"{ex['n_subtokens']} AS n_subtokens",
        f"{ex['avg_token_len']} AS avg_token_len",
    )


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    staged = _with_tokens(df, col, ["doc_id"])
    counts = staged.selectExpr(
        "doc_id",
        *[
            f"{marker_count_expr('__toks', dual.SPARK, words)} AS __c_{lang}"
            for lang, words in LANG_MARKERS.items()
        ],
    )
    case = lang_id_case_expr({lang: f"__c_{lang}" for lang in LANG_MARKERS})
    return counts.selectExpr("doc_id", f"{case} AS lang_pred")


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    staged = _with_tokens(df, col, ["doc_id"])
    return staged.selectExpr(
        "doc_id", f"{quality_score_expr(col, '__toks', dual.SPARK)} AS quality"
    )


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Order-sensitive rolling-hash fingerprint (reorder-detecting,
    whitespace-normalizing)."""
    from hadoop_data_pipeline_spark.operators.queries import (
        scatter_small_scan,
    )

    staged = dual.stage_spark_token_hashes(
        scatter_small_scan(df), col, ["doc_id"]
    )
    return staged.selectExpr(
        "doc_id", f"{dual.fingerprint_from_hashes('__th', dual.SPARK)} AS fingerprint"
    )


def add_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    """All-in-one enrichment used by pipeline consumers: token count,
    predicted language, quality score, fingerprint."""
    keep = df.columns
    staged = df.selectExpr(*keep, f"{dual.tokens(col, dual.SPARK)} AS __toks")
    staged = staged.selectExpr(
        *keep,
        "__toks",
        f"{dual.hash_array('__toks', dual.SPARK)} AS __th",
        *[
            f"{marker_count_expr('__toks', dual.SPARK, words)} AS __c_{lang}"
            for lang, words in LANG_MARKERS.items()
        ],
    )
    case = lang_id_case_expr({lang: f"__c_{lang}" for lang in LANG_MARKERS})
    return staged.selectExpr(
        *keep,
        f"size(__toks) AS n_tokens",
        f"{case} AS lang_pred",
        f"{quality_score_expr(col, '__toks', dual.SPARK)} AS quality",
        f"{dual.fingerprint_from_hashes('__th', dual.SPARK)} AS fingerprint",
    )


def compression_ratio(df: DataFrame, col: str = "text") -> DataFrame:
    """Zlib compression ratio per document via a SCALAR ``pandas_udf``
    — the boilerplate/repetition quality signal (templated and
    machine-generated text compresses far better than natural prose;
    the Gopher-style filters threshold on exactly this). Returns
    (doc_id, n_bytes, compressed_bytes, ratio), ratio = compressed /
    raw in (0, ~1.1].

    This is also the engine's scalar-pandas-UDF exemplar (SURVEY.md
    §2.11), completing the Python-surface taxonomy next to grouped
    applyInPandas, mapInPandas, applyInPandasWithState and the UDTF:
    use this shape when per-VALUE logic needs a Python library (zlib
    here) but no grouping or multi-row state — Arrow ships the column
    batch, numpy/pandas vectorize the loop, no shuffle is introduced.
    zlib level is pinned so the output is deterministic across
    workers and retries.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def compressed_len(s: pd.Series) -> pd.Series:
        # Nullable Int64 (capital I), not int64: plain int64 raises
        # IntCastingNaNError on any NULL text, killing the whole task
        # instead of passing the null through.
        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            if t is not None
            else None
        ).astype("Int64")

    out = df.select(
        "doc_id",
        F.octet_length(F.col(col)).cast("long").alias("n_bytes"),
        compressed_len(F.col(col)).alias("compressed_bytes"),
    )
    return out.withColumn(
        "ratio",
        F.round(F.col("compressed_bytes") / F.col("n_bytes"), 6),
    )


def top_bigram_char_fraction(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher repetition rule (Rae et al. 2021 §A1.1): per document,
    the most frequent word 2-gram and the fraction of the document's
    characters its occurrences cover — the signal that catches
    boilerplate a distinct-token ratio misses (a page repeating
    "click here" keeps high token diversity elsewhere). Returns
    (id, top_bigram, n_occurrences, top_bigram_char_frac) for every
    document with >= 2 tokens; ties break on the lexicographically
    first bigram. Occurrences may overlap, so the fraction can
    exceed 1 on degenerate single-token documents — kept uncapped,
    as in the paper's accounting.

    Plan: explode ALL bigram occurrences (no distinct), count per
    (doc, gram) — ONE hash exchange with map-side partial counts —
    then a per-doc row_number window on the same doc-keyed
    partitioning picks the top gram without a second corpus pass."""
    staged = df.selectExpr(
        id_col,
        f"length(trim({col})) AS __nc",
        f"{dual.tokens(col, dual.SPARK)} AS __tk",
    )
    grams = dual.shingles_from_tokens("__tk", dual.SPARK, n=2, distinct=False)
    ex = staged.select(
        id_col, "__nc", F.explode(F.expr(grams)).alias("top_bigram")
    )
    cnt = ex.groupBy(id_col, "__nc", "top_bigram").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("n_occurrences"), F.col("top_bigram")
    )
    return (
        cnt.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .selectExpr(
            id_col,
            "top_bigram",
            "n_occurrences",
            "round(cast(n_occurrences * length(top_bigram) as double)"
            " / cast(__nc as double), 6) AS top_bigram_char_frac",
        )
    )

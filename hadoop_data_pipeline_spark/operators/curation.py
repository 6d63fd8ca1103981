"""Corpus-curation operators for a training-data pipeline (north-star
extension alongside :mod:`dedup` / :mod:`similarity` / :mod:`text`):
repetition-based quality signals, PII detection/redaction,
deterministic train/val/test splitting, corpus-wide vocabulary,
benchmark-contamination checks, weighted corpus mixing, and semantic
(embedding-space) deduplication.

Every operator is defined over :mod:`~hadoop_data_pipeline_spark.functions.dual`
dual-dialect expressions so the DuckDB oracle computes the identical
deterministic function — no tolerance compares, no seeded randomness.

Scale notes (100 TB discipline), per operator:

* ``repetition_stats`` / ``pii_stats`` — embarrassingly parallel JVM
  projections: zero shuffle, full whole-stage codegen, parquet scan
  pruned to (id, text).
* ``hash_split`` / ``corpus_mix_sample`` — *stateless* hash routing:
  no shuffle, no sampled-state to coordinate, stable under retries and
  under corpus growth (a document's split never changes when other
  documents arrive — the property that keeps eval sets honest).
* ``token_vocab`` — explode + partial aggregation: the zipfian head
  (hot tokens) is absorbed map-side before the exchange, so the
  shuffle carries one row per (task, token), not per occurrence;
  top-k goes through ``TakeOrderedAndProject`` (no global sort).
* ``contamination_check`` — the benchmark side is small by
  construction (eval suites are KBs-to-MBs); its postings BROADCAST,
  so the 100 TB corpus is never shuffled at all — a map-side
  hash-join + per-pair count.
* ``semantic_dedup`` — LSH/label-blocked candidate pairs (never
  all-pairs) resolved to clusters with the iterative min-label
  propagation of :func:`dedup.connected_components`.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from hadoop_data_pipeline_spark.functions import dual
from hadoop_data_pipeline_spark.operators import dedup as dd
from hadoop_data_pipeline_spark.operators import similarity as sim
from hadoop_data_pipeline_spark.operators.queries import _with_cached_deps

# ---------------------------------------------------------------------------
# PII patterns — dialect-portable regexes: no backslash classes (\d, \b)
# so the same literal parses identically under Java regex (Spark) and
# RE2 (DuckDB), and no SQL-string escaping is needed.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
        "<IP>",
    ),
    "phone": (
        "[+][0-9][0-9 ()-]{6,}[0-9]",
        "<PHONE>",
    ),
}
#: Redaction order matters (an email's local part can contain digits);
#: fixed here so both dialects apply the identical chain.
PII_ORDER: tuple[str, ...] = ("email", "ipv4", "phone")


def pii_count_expr(col: str, kind: str, dialect: str) -> str:
    pat, _ = PII_PATTERNS[kind]
    if dialect == dual.SPARK:
        return f"size(regexp_extract_all({col}, '{pat}', 0))"
    return f"len(regexp_extract_all({col}, '{pat}'))"


def pii_redact_expr(col: str, dialect: str) -> str:
    """Chained global regexp_replace over all PII kinds, in PII_ORDER.
    Spark replaces globally by default; DuckDB needs the 'g' flag."""
    flags = ", 'g'" if dialect == dual.DUCK else ""
    expr = col
    for kind in PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        expr = f"regexp_replace({expr}, '{pat}', '{repl}'{flags})"
    return expr


def pii_stats(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts plus the redacted text's length and md5
    (the digest keys downstream exact-dedup of the *cleaned* corpus).
    Zero shuffle; the text column never leaves the executor."""
    d = dual.SPARK
    return df.selectExpr(
        id_col,
        *[f"{pii_count_expr(col, k, d)} AS n_{k}" for k in PII_ORDER],
        f"length({pii_redact_expr(col, d)}) AS redacted_len",
        f"md5({pii_redact_expr(col, d)}) AS redacted_md5",
    )


def redact_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Replace PII in-place (same column name), all other columns kept."""
    keep = [c for c in df.columns if c != col]
    return df.selectExpr(
        *keep, f"{pii_redact_expr(col, dual.SPARK)} AS {col}"
    )


# ---------------------------------------------------------------------------
# Repetition / quality signals (Gopher-style filters, dialect-exact)
# ---------------------------------------------------------------------------


def repetition_exprs(toks_col: str, dialect: str) -> dict[str, str]:
    """Duplicate-token and duplicate-bigram fractions from a staged
    tokens column — the classic "machine-generated boilerplate"
    signals. Ratios of integers, rounded identically both sides."""
    n = f"cast({dual.arr_size(toks_col, dialect)} as double)"
    nd = f"cast({dual.arr_size(dual.arr_distinct(toks_col, dialect), dialect)} as double)"
    bi = dual.shingles_from_tokens(toks_col, dialect, n=2)
    nbd = f"cast({dual.arr_size(bi, dialect)} as double)"
    return {
        "dup_token_frac": f"round(1.0 - {nd} / greatest({n}, 1.0), 6)",
        "dup_bigram_frac": (
            f"(CASE WHEN {n} <= 1.0 THEN 0.0"
            f" ELSE round(1.0 - {nbd} / ({n} - 1.0), 6) END)"
        ),
    }


def repetition_stats(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, dup_token_frac, dup_bigram_frac) — pure staged
    projection, no shuffle; filters compose with text.quality_score."""
    staged = df.selectExpr(
        id_col, f"{dual.tokens(col, dual.SPARK)} AS __toks"
    )
    ex = repetition_exprs("__toks", dual.SPARK)
    return staged.selectExpr(
        id_col,
        "size(__toks) AS n_tokens",
        f"{ex['dup_token_frac']} AS dup_token_frac",
        f"{ex['dup_bigram_frac']} AS dup_bigram_frac",
    )


# ---------------------------------------------------------------------------
# Deterministic splitting & weighted corpus mixing
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 10_000


def sql_str_lit(s: str) -> str:
    """A string as a SQL single-quoted literal, with embedded single
    quotes doubled — every CASE/IN builder below interpolates
    user-supplied mapping keys (split names, source names, language
    codes) into SQL text, and an unescaped quote would break (or
    silently alter) the generated expression. Doubling is the portable
    escape in both dialects (Spark SQL and DuckDB)."""
    return "'" + str(s).replace("'", "''") + "'"


def split_bucket_expr(id_col: str, salt: str, dialect: str) -> str:
    """Stable bucket in [0, SPLIT_BUCKETS): 28-bit md5 of the salted id.
    Salting decorrelates independent splits over the same corpus."""
    keyed = f"concat(cast({id_col} as string), '|{salt}')"
    return f"({dual.md5_int(keyed, dialect)} % {SPLIT_BUCKETS})"


def split_case_expr(bucket: str, weights: Mapping[str, float]) -> str:
    """CASE over cumulative weight thresholds, in dict order. Weights
    must sum to 1 (validated by callers); the last split absorbs the
    rounding remainder so every bucket lands somewhere."""
    if not weights:
        raise ValueError("split weights mapping is empty")
    names = list(weights)
    whens, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        whens.append(
            f"WHEN {bucket} < {int(round(acc * SPLIT_BUCKETS))}"
            f" THEN {sql_str_lit(name)}"
        )
    if not whens:  # single split: CASE needs >= 1 WHEN arm
        return sql_str_lit(names[-1])
    return "CASE " + " ".join(whens) + f" ELSE {sql_str_lit(names[-1])} END"


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds ``bucket`` and
    ``split`` columns. Purely stateless — no shuffle, no sampling
    state, retry-safe, and stable as the corpus grows (assignment
    depends only on the row's own id + salt)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket_expr(id_col, salt, dual.SPARK)
    return df.selectExpr(
        "*", f"{bucket} AS bucket"
    ).selectExpr("*", f"{split_case_expr('bucket', weights)} AS split")


def mix_rate_case_expr(
    source_col: str, rates: Mapping[str, float], default_rate: float
) -> str:
    default = int(round(default_rate * SPLIT_BUCKETS))
    if not rates:  # CASE with zero WHEN arms is invalid SQL
        return str(default)
    whens = " ".join(
        f"WHEN {source_col} = {sql_str_lit(s)}"
        f" THEN {int(round(r * SPLIT_BUCKETS))}"
        for s, r in rates.items()
    )
    return f"CASE {whens} ELSE {default} END"


def corpus_mix_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Weighted corpus mixing: keep each row with its source's rate,
    decided by a stable hash of (id, source, salt) — the deterministic
    analogue of ``df.sample`` that is reproducible across runs,
    retries, and partitionings (``sample`` is none of those). Filter
    only — no shuffle; composes with any downstream partitioning."""
    keyed = f"concat(cast({id_col} as string), '|', {source_col}, '|{salt}')"
    bucket = f"({dual.md5_int(keyed, dual.SPARK)} % {SPLIT_BUCKETS})"
    thresh = mix_rate_case_expr(source_col, rates, default_rate)
    return df.where(F.expr(f"{bucket} < {thresh}"))


def mixture_budget_plan(
    df: DataFrame,
    weights: Mapping[str, float],
    total_budget: int,
    col: str = "text",
    key_col: str = "lang",
) -> DataFrame:
    """Token-budget mixture PLANNING — the step before
    :func:`corpus_mix_sample`'s row-level execution: given target
    mixture ``weights`` per slice (lang/source/domain) and a total
    training-token budget, report per slice how many tokens exist,
    how many the recipe wants (``target_tokens = weight * budget``),
    and the resulting ``epochs`` factor (``target / available``) —
    the number every mixture recipe (Pile-style weighting, DoReMi
    outputs) needs to decide what gets up-sampled (epochs > 1,
    repeated data — flag and cap it) and what gets down-sampled
    (epochs < 1 — feed the rate to ``corpus_mix_sample``).

    Deterministic and dual-dialect (weights become a CASE literal;
    counts cast to BIGINT; epochs rounded at 4), so it has an exact
    SQL oracle. Scale: one column-pruned scan computing per-row token
    counts (never exploding tokens to rows — ``size(split(...))`` is
    a per-row projection), one partial-agg'd shuffle of
    |slices| groups, then pure literal arithmetic; output is
    |slices| rows regardless of corpus size. A slice missing from
    ``weights`` gets weight 0.0 (excluded by the recipe — visible in
    the report rather than silently dropped)."""
    if not weights:
        raise ValueError(
            "mixture weights mapping is empty — a budget plan needs at "
            "least one target slice"
        )
    cases = " ".join(
        f"WHEN {sql_str_lit(k)} THEN CAST({float(v)!r} AS DOUBLE)"
        for k, v in sorted(weights.items())
    )
    w = f"(CASE {key_col} {cases} ELSE CAST(0.0 AS DOUBLE) END)"
    ntok = f"size({dual.tokens(col, dual.SPARK)})"
    return (
        df.selectExpr(key_col, f"CAST({ntok} AS BIGINT) AS __nt")
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
        )
        .selectExpr(
            key_col,
            "n_docs",
            "n_tokens",
            f"{w} AS weight",
            f"CAST(round({w} * {total_budget}) AS BIGINT) AS target_tokens",
            f"round(CAST(round({w} * {total_budget}) AS BIGINT)"
            " / CAST(n_tokens AS DOUBLE), 4) AS epochs",
        )
    )


# ---------------------------------------------------------------------------
# Corpus-wide vocabulary (wordcount with a scale-honest plan)
# ---------------------------------------------------------------------------


def token_vocab(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", k: int = 50
) -> DataFrame:
    """Top-k corpus vocabulary: (token, tf, df) ordered by tf desc with
    a deterministic token tie-break. tf counts occurrences, df counts
    distinct documents. The zipfian-head skew is absorbed by map-side
    partial aggregation; top-k is ``TakeOrderedAndProject`` (no global
    sort materialized)."""
    toks = df.selectExpr(
        id_col, f"explode({dual.tokens(col, dual.SPARK)}) AS token"
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(k)
    )


def unigram_logprob_score(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Unigram-LM pseudo-perplexity quality signal — the shape of a
    KenLM perplexity filter with the n-gram model replaced by a
    unigram model trained on the corpus itself (no external model in
    this container; swapping in real LM probabilities changes only the
    vocab frame). Score = mean token log-probability with add-k
    smoothing; unusually low scores flag gibberish / atypical docs:

        avg_logp(d) = (1/|d|) * sum_t ln((tf(t) + s) / (T + s·V))

    Scale shapes: the vocabulary is one partial-agg shuffle on token
    keys; (T, V) is a 1-row aggregate broadcast by cross join; doc
    scoring joins postings to the vocab on token — a plain hash join
    whose zipf-head skew is AQE's skew-join case. Deterministic, no
    sampling; returns (id, n_tokens, avg_logp).
    """
    toks = df.selectExpr(
        id_col, f"explode({dual.tokens(col, dual.SPARK)}) AS token"
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    totals = vocab.agg(
        F.sum("tf").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    s = float(smoothing)
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(
                    F.expr(
                        f"ln((tf + {s}) / (cast(__T as double) + {s} * __V))"
                    )
                ),
                6,
            ).alias("avg_logp"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per language by TF-IDF — the classic
    what-distinguishes-this-slice corpus report (:func:`token_vocab`
    ranks by raw frequency, which surfaces the same stopword head for
    every slice; the IDF weight is what pushes slice-SPECIFIC terms
    up). tf counts occurrences within the slice; idf is the smoothed
    corpus-wide ``ln((N + 1) / (df + 1))`` with df in DOCUMENTS —
    cross-slice, so a term common everywhere is discounted everywhere.

    Ranking uses the ROUNDED score (round 6) with a token tie-break:
    the unrounded double differs across engines in the last ulp, and
    ranking on it would make top-k boundary rows engine-dependent —
    the oracle ranks on the identical rounded value.

    Scale: the exploded postings frame is PERSISTED so the scan +
    explode runs once and feeds both aggregates (token df is a
    digest-width shuffle; per-slice tf partial-aggs the zipf head
    map-side) — without the persist, the two differently-keyed
    aggregations would each re-run the scan and explode. The cache
    must outlive the returned lazy plan, so callers that loop this
    operator should release it with
    :func:`~hadoop_data_pipeline_spark.operators.queries.unpersist_deps`
    after materializing. N is a 1-row aggregate broadcast by cross
    join; top-k per slice is one window over slice partitions, never
    a global sort."""
    toks = df.selectExpr(
        lang_col, id_col, f"explode({dual.tokens(col, dual.SPARK)}) AS token"
    ).persist()
    dfc = toks.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__N"))
    scored = (
        toks.groupBy(lang_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dfc, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.expr("ln((__N + 1.0) / (df + 1.0))"), 6
            ),
        )
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    out = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(lang_col, "token", "tf", "df", "tfidf")
    )
    return _with_cached_deps(out, toks)


def quality_bucket_stats(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 5,
    smoothing: float = 0.5,
) -> DataFrame:
    """Curriculum/difficulty stratification: bucket documents into
    ``n_buckets`` quality tiers by their unigram-LM score
    (:func:`unigram_logprob_score`) and report each tier's size,
    token mass, and score range — the stats a curriculum sampler or
    a quality-weighted mixer consumes (e.g. upsample the top tier,
    cap the bottom).

    Bucketing is by exact-percentile BOUNDARIES, not a global
    ``ntile``: ntile needs one totally-ordered window partition — a
    single-task sort at 100 TB — while boundaries are one partial-
    agg'd aggregate broadcast back over the scored frame. Boundary
    arithmetic: scores are rounded (6) upstream, boundaries are
    rounded (6) too, and a doc lands in the lowest tier whose
    boundary its score does not exceed — deterministic on both
    engines because comparisons only ever see the rounded doubles.

    The scored frame is PERSISTED (narrow: id, n_tokens, avg_logp —
    never text): both the boundary aggregate and the bucket pass
    consume it, and each un-cached reference re-runs the whole
    unigram-LM scoring pipeline over the corpus (the r11 scan-count
    audit measured the doubled scans). `_with_cached_deps` lifecycle."""
    scored = unigram_logprob_score(
        df, col=col, id_col=id_col, smoothing=smoothing
    ).persist()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = scored.agg(
        *[
            F.round(F.expr(f"percentile(avg_logp, {q!r})"), 6).alias(
                f"__b{i}"
            )
            for i, q in enumerate(qs)
        ]
    )
    bucket = "1"
    for i in range(len(qs)):
        bucket += f" + (CASE WHEN avg_logp > __b{i} THEN 1 ELSE 0 END)"
    out = (
        scored.crossJoin(F.broadcast(bounds))
        .selectExpr("n_tokens", "avg_logp", f"CAST({bucket} AS INT) AS bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.min("avg_logp"), 6).alias("min_logp"),
            F.round(F.max("avg_logp"), 6).alias("max_logp"),
        )
    )
    return _with_cached_deps(out, scored)


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_broadcast_postings: int | None = 5_000_000,
) -> DataFrame:
    """Flag corpus documents whose shingles are contained in a
    benchmark/eval document: containment(c, b) = |sh(c) ∩ sh(b)| /
    |sh(c)| >= threshold. Returns (corpus_id, bench_id, n_overlap,
    containment).

    BOUNDEDNESS ASSUMPTION, now guarded: the benchmark side is
    broadcast because real eval suites are KBs–MBs — tiny relative to
    a training corpus — so the corpus is scanned once with a map-side
    hash join on shingle hashes; the 100 TB side never shuffles, and
    the only exchange is the per-(corpus, bench) pair count, bounded
    by matches. But nothing STRUCTURAL stops a caller handing a
    corpus-sized "benchmark" (the fixture's is ``doc_id % 97`` — it
    grows with the corpus), and an unbounded broadcast is a driver
    OOM, so the postings row count is CHECKED first (one bounded
    aggregate over the benchmark side only; the corpus is untouched)
    and the join falls back to a shuffled hash join above
    ``max_broadcast_postings`` — same rows either way, pinned by
    test. ``None`` skips the count for pre-validated callers.
    """
    # array_distinct(__sh) intentionally appears TWICE: the double
    # reference to __sh stops CollapseProject from inlining the staged
    # md5-shingle chain into its consumers. "Staging" array_distinct
    # into its own projection (single reference) lets Catalyst collapse
    # and re-evaluate the whole chain per consumer — measured 4x slower
    # at sf0.1.
    from hadoop_data_pipeline_spark.operators.queries import (
        _with_cached_deps,
    )

    c = dd.staged_shingle_hashes(corpus, col, id_col).selectExpr(
        f"{id_col} AS corpus_id",
        "size(array_distinct(__sh)) AS n_c",
        "explode(array_distinct(__sh)) AS __h",
    )
    deps: list = []
    staged_b = dd.staged_shingle_hashes(benchmark, col, id_col)
    if max_broadcast_postings is not None:
        # Count-before-broadcast: one benchmark-side aggregate (never
        # touches the corpus). The staged benchmark frame is PERSISTED
        # so the guard count and the join build read ONE tokenize pass
        # (the un-cached form ran the benchmark shingle pipeline twice
        # — r16); the cache is benchmark-sized, i.e. tiny whenever the
        # boundedness assumption holds, and spills rather than OOMs
        # when a caller hands a corpus-sized "benchmark". The postings
        # count is summed from the staged array sizes — no explode
        # needed for the guard. shuffle_hash, not merge: the corpus
        # side must not sort.
        staged_b = staged_b.persist()
        deps.append(staged_b)
        try:
            n_postings = int(
                staged_b.selectExpr(
                    "sum(size(array_distinct(__sh))) AS n"
                ).collect()[0]["n"]
                or 0
            )
        except Exception:
            # The guard job failed (bad column, executor loss): the
            # persisted benchmark frame would otherwise leak in the
            # cache until clearCache, and the _cached_deps tag never
            # reaches the caller (ADVICE r16).
            staged_b.unpersist()
            raise
        b = staged_b.selectExpr(
            f"{id_col} AS bench_id",
            "explode(array_distinct(__sh)) AS __h",
        )
        if n_postings > max_broadcast_postings:
            b = b.hint("shuffle_hash")
        else:
            b = F.broadcast(b)
    else:
        b = F.broadcast(
            staged_b.selectExpr(
                f"{id_col} AS bench_id",
                "explode(array_distinct(__sh)) AS __h",
            )
        )
    pairs = (
        c.join(b, "__h")
        .groupBy("corpus_id", "bench_id", "n_c")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .selectExpr(
            "corpus_id",
            "bench_id",
            "n_overlap",
            "round(cast(n_overlap as double) / cast(n_c as double), 6)"
            " AS containment",
        )
    )
    return _with_cached_deps(
        pairs.where(F.col("containment") >= threshold), *deps
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_broadcast_postings: int | None = 5_000_000,
) -> DataFrame:
    """The REMOVAL half of :func:`contamination_check` — the step
    every LLM training pipeline actually runs before training: drop
    every corpus document whose shingle containment in ANY benchmark
    document reaches ``threshold``, returning the retained corpus
    with its full row (detection tells you what leaked; this is the
    decontaminated corpus you train on). Doc-level removal, the
    standard GPT-3/Llama-style policy — surgical span removal is
    :func:`dedup.remove_shared_substrings`' job when the overlap is a
    quotation rather than an embedded eval item.

    Scale: the flagged-id set is bounded by MATCHES (eval suites are
    KBs–MBs, so containment hits are rare by construction), never by
    the corpus — it is distinct-collapsed and explicitly broadcast
    into a LEFT ANTI join, so the 100 TB corpus is scanned once and
    never shuffles: detection's map-side postings join plus one
    broadcast anti join. The benchmark-postings broadcast inside
    detection carries the guarded boundedness assumption — see
    :func:`contamination_check`; ``max_broadcast_postings`` passes
    through. The flagged-ID broadcast needs no guard: it is already
    capped at one id per corpus document that crossed the containment
    threshold against a bounded eval suite."""
    from hadoop_data_pipeline_spark.operators.queries import (
        _with_cached_deps,
    )

    hits = contamination_check(
        corpus,
        benchmark,
        col=col,
        id_col=id_col,
        threshold=threshold,
        max_broadcast_postings=max_broadcast_postings,
    )
    flagged = hits.select(F.col("corpus_id").alias(id_col)).distinct()
    # Propagate the detection step's persisted benchmark staging to
    # the returned frame (transformations strip the _cached_deps tag).
    return _with_cached_deps(
        corpus.join(F.broadcast(flagged), id_col, "left_anti"),
        *getattr(hits, "_cached_deps", []),
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: embedding-space near-dup clusters)
# ---------------------------------------------------------------------------


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-space dedup: cosine near-dup pairs (label- or
    LSH-blocked, never all-pairs) -> connected components -> one
    canonical (min-id) survivor per semantic cluster. Returns
    (id_col, cluster_id, is_canonical) for every input row.

    This is the embedding analogue of ``dedup.dedup_clusters`` and
    shares its scale shape: bounded candidate blocks, iterative
    min-label propagation with lineage checkpoints.
    """
    pairs = sim.embedding_near_dup_pairs(
        emb, threshold=threshold, id_col=id_col, vec_col=vec_col,
        block_col=block_col,
    ).select("id_a", "id_b")
    comps = dd.connected_components(pairs, emb.select(id_col), id_col=id_col)
    return comps.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Per-source corpus composition report
# ---------------------------------------------------------------------------


def per_source_stats(
    df: DataFrame,
    source_col: str = "source",
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus composition by source: docs, total/avg token volume,
    distinct languages. One partial-agg shuffle keyed by source."""
    staged = df.selectExpr(
        id_col,
        source_col,
        "lang",
        f"{dual.arr_size(dual.tokens(col, dual.SPARK), dual.SPARK)} AS __n",
    )
    return (
        staged.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("total_tokens"),
            F.round(F.avg("__n"), 6).alias("avg_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# Segment-level (C4-style "line") dedup
# ---------------------------------------------------------------------------


def intdiv(a: str, b: str, dialect: str) -> str:
    """Integer floor division, identically in both engines."""
    op = "div" if dialect == dual.SPARK else "//"
    return f"(({a}) {op} ({b}))"


def segment_exprs(
    toks_col: str, dialect: str, seg_len: int
) -> tuple[str, str]:
    """(segment-index list, segment-text lambda body) from a staged
    tokens column. Segment ``i`` (0-based) covers tokens
    ``[i*L+1, min((i+1)*L, n)]`` (1-based, inclusive) — the last
    segment is allowed to run short. The caller explodes/unnests the
    index list and evaluates the text expression per index column."""
    n = dual.arr_size(toks_col, dialect)
    n_seg = intdiv(f"{n} + {seg_len - 1}", str(seg_len), dialect)
    idx_list = dual.index_range("0", f"({n_seg}) - 1", dialect)

    def seg_text(i: str) -> str:
        rng = dual.index_range(
            f"({i}) * {seg_len} + 1",
            f"least((({i}) + 1) * {seg_len}, {n})",
            dialect,
        )
        elems = dual.transform(
            rng, f"j -> {dual.element(toks_col, 'j', dialect)}", dialect
        )
        join_fn = "array_join" if dialect == dual.SPARK else "array_to_string"
        return f"{join_fn}({elems}, ' ')"

    return idx_list, seg_text("__i")


def segment_dedup(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 8,
) -> DataFrame:
    """C4-style global segment dedup: split every document into
    non-overlapping ``seg_len``-token segments, keep only the corpus's
    FIRST occurrence of each segment (ordered by (id, segment index)),
    and rebuild the document from its surviving segments. Returns
    (id, n_segments, n_kept, clean_len, clean_md5) for EVERY input
    document — a fully-deduped document survives with n_kept=0 and
    empty text.

    Scale shape: the first-occurrence pick is one ``row_number``
    window hash-partitioned on the segment's md5 — each digest's
    partition is independent, so the shuffle carries (digest, id,
    seg_idx) keys, never the corpus text twice; the rebuild is one
    groupBy(id) whose input is already deduped (strictly smaller than
    the corpus). The reference corpus has no newline structure, so the
    segmentation is fixed-width by tokens; swap ``segment_exprs`` for
    a newline split when documents have real lines.
    """
    toks = df.selectExpr(id_col, f"{dual.tokens(col, dual.SPARK)} AS __tk")
    idx_list, seg_text = segment_exprs("__tk", dual.SPARK, seg_len)
    segs = toks.selectExpr(
        id_col, "__tk", f"explode({idx_list}) AS __i"
    ).selectExpr(id_col, "__i", f"md5({seg_text}) AS __d", f"{seg_text} AS __seg")
    w = Window.partitionBy("__d").orderBy(id_col, "__i")
    kept = (
        segs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__i", "__seg"))
                    ),
                    lambda s: s["__seg"],
                ),
                " ",
            ).alias("__clean"),
        )
    )
    totals = toks.selectExpr(id_col, f"size({idx_list}) AS n_segments")
    return (
        totals.join(kept, id_col, "left")
        .selectExpr(
            id_col,
            "n_segments",
            "coalesce(n_kept, 0) AS n_kept",
            "length(coalesce(__clean, '')) AS clean_len",
            "md5(coalesce(__clean, '')) AS clean_md5",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis order sampling)
# ---------------------------------------------------------------------------

#: Denominator for hash->uniform: md5_int yields 28-bit ints, so
#: u = (h + 1) / (2^28 + 1) lies in (0, 1] exactly in both engines.
_U_DENOM = (1 << 28) + 1


def es_key_expr(
    id_col: str, weight_expr: str, salt: str, dialect: str
) -> str:
    """Efraimidis-Spirakis order-sampling key: ln(u)/w with u derived
    from a stable hash of (id, salt). Ranking DESC by this key and
    taking the top k per stratum is a weighted sample WITHOUT
    replacement with inclusion probability proportional to w — the
    one-pass, coordination-free form of weighted reservoir sampling
    (Efraimidis & Spirakis 2006). Rounded to 6 decimals so both
    engines' ln agree bit-for-bit after rounding; ties broken by id
    at the call site."""
    keyed = f"concat(cast({id_col} as string), '|{salt}')"
    u = (
        f"(cast({dual.md5_int(keyed, dialect)} as double) + 1.0)"
        f" / {_U_DENOM}.0"
    )
    return f"round(ln({u}) / cast({weight_expr} as double), 6)"


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_expr: str,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "ws-v1",
) -> DataFrame:
    """Top-``k`` weighted sample (per ``stratum_col`` if given):
    deterministic Efraimidis-Spirakis order sampling. Unlike
    ``df.sample``, the result is identical across runs, retries, and
    partitionings, and unlike rate-based ``corpus_mix_sample`` it
    returns an EXACT count with probability proportional to weight —
    the right primitive when the training mix prescribes "n documents
    from this source, length-weighted".

    Returns the input row's id/stratum plus ``es_key`` and
    ``sample_rank``. Scale shape: the per-stratum rank<=k is
    WindowGroupLimit — map tasks truncate to k before the exchange;
    the weight expression stays JVM-side."""
    key = es_key_expr(id_col, weight_expr, salt, dual.SPARK)
    cols = [id_col] + ([stratum_col] if stratum_col else [])
    staged = df.selectExpr(*cols, f"{key} AS es_key")
    part = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col("es_key").desc(), F.col(id_col)
    )
    return (
        staged.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


# ---------------------------------------------------------------------------
# Per-domain document cap (over-represented-source throttling)
# ---------------------------------------------------------------------------


def domain_cap(
    df: DataFrame,
    cap: int = 10,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap-v1",
) -> DataFrame:
    """Keep at most ``cap`` documents per source/domain, chosen by a
    stable hash of the document id — the standard throttle for
    over-represented domains (one forum mirror must not dominate the
    corpus). Returns (id, source, cap_rank) for the survivors.

    Deterministic: the hash ranking means a document's keep/drop
    decision depends only on its own id and which other documents
    share its domain — reproducible across runs and partitionings
    (unlike ``sample``). Scale shape: ``row_number() <= cap`` is
    Spark's ``WindowGroupLimit`` case — each map task pre-truncates
    every domain group to ``cap`` rows BEFORE the exchange, so the
    shuffle carries at most cap rows per (task, domain) even for a
    domain with a billion pages; text is never shuffled (the rank is
    computed on (id, source, hash) keys only).
    """
    keyed = f"concat(cast({id_col} as string), '|{salt}')"
    staged = df.selectExpr(
        id_col, source_col, f"{dual.md5_int(keyed, dual.SPARK)} AS __r"
    )
    w = Window.partitionBy(source_col).orderBy("__r", id_col)
    return (
        staged.withColumn("cap_rank", F.row_number().over(w))
        .where(F.col("cap_rank") <= cap)
        .select(id_col, source_col, "cap_rank")
    )


# ---------------------------------------------------------------------------
# Fixed-size overlapping chunks (training-sequence construction)
# ---------------------------------------------------------------------------


def chunk_exprs(
    toks_col: str, dialect: str, chunk_len: int, stride: int
) -> tuple[str, str, str]:
    """(n_chunks, chunk-token-count, chunk-md5) expressions over a
    staged tokens column and a ``chunk_id`` column (0-based). Chunk i
    covers tokens ``[i*stride+1, min(i*stride+chunk_len, n)]``
    (1-based inclusive): chunks start every ``stride`` tokens and
    overlap by ``chunk_len - stride``; the last chunk runs short
    rather than padding. n_chunks = 1 + ceil(max(n-chunk_len,0)/stride)
    so every token is covered and a short document yields one chunk."""
    if stride <= 0 or chunk_len < stride:
        raise ValueError("need 0 < stride <= chunk_len")
    n = dual.arr_size(toks_col, dialect)
    n_chunks = (
        "(1 + "
        + intdiv(
            f"greatest({n} - {chunk_len}, 0) + {stride - 1}",
            str(stride),
            dialect,
        )
        + ")"
    )
    lo = f"chunk_id * {stride} + 1"
    hi = f"least(chunk_id * {stride} + {chunk_len}, {n})"
    count = f"({hi}) - ({lo}) + 1"
    rng = dual.index_range(lo, hi, dialect)
    elems = dual.transform(
        rng, f"j -> {dual.element(toks_col, 'j', dialect)}", dialect
    )
    join_fn = "array_join" if dialect == dual.SPARK else "array_to_string"
    return n_chunks, count, f"md5({join_fn}({elems}, ' '))"


def chunk_docs(
    df: DataFrame,
    chunk_len: int = 32,
    stride: int = 24,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into fixed-size overlapping token chunks —
    the training-sequence construction step (context windows with
    overlap so no span is ever cut without a covering chunk). Returns
    (id, chunk_id, n_chunk_tokens, chunk_md5) — the md5 stands in for
    the chunk payload so the result stays compact and oracle-hashable;
    materializing the text instead is the same plan.

    Scale shape: pure per-row explode — zero shuffle, whole-stage
    codegen; output size is corpus_tokens/stride rows regardless of
    document skew, and the explode streams (no per-doc buffering
    beyond the one tokens array already in memory)."""
    toks = df.selectExpr(id_col, f"{dual.tokens(col, dual.SPARK)} AS __tk")
    n_chunks, count, chunk_md5 = chunk_exprs(
        "__tk", dual.SPARK, chunk_len, stride
    )
    idx = dual.index_range("0", f"({n_chunks}) - 1", dual.SPARK)
    exploded = toks.selectExpr(
        id_col, "__tk", f"explode({idx}) AS chunk_id"
    )
    return exploded.selectExpr(
        id_col,
        "cast(chunk_id as bigint) AS chunk_id",
        f"cast({count} as bigint) AS n_chunk_tokens",
        f"{chunk_md5} AS chunk_md5",
    )


# ---------------------------------------------------------------------------
# Incremental dedup (new batch vs already-indexed corpus)
# ---------------------------------------------------------------------------


def incremental_dedup(
    new_df: DataFrame,
    index_df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-dedup a NEW ingestion batch against an already-indexed
    corpus: a new document survives iff its content digest (md5 of
    text) appears nowhere in the index AND it is the first occurrence
    (min id) of that digest within its own batch. Returns
    (id, digest) for the survivors — the incremental form of
    ``dedup.dedup_exact`` that avoids re-deduping the whole corpus on
    every ingest.

    Scale shape: both sides reduce to 32-char digests before any
    shuffle (text never moves); the within-batch first-pick is a
    ``WindowGroupLimit`` row_number on the digest; the index probe is
    a LEFT ANTI hash join on the digest — when the daily batch is
    small relative to the corpus the index side streams from its
    digest manifest (in this engine: a parquet of digests written by
    the previous run) and the join shuffles only digests."""
    nd = new_df.selectExpr(id_col, f"md5({col}) AS digest")
    idx = index_df.selectExpr(f"md5({col}) AS digest").distinct()
    w = Window.partitionBy("digest").orderBy(id_col)
    first = (
        nd.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    return first.join(idx, "digest", "left_anti").select(id_col, "digest")


# ---------------------------------------------------------------------------
# Token-budget shard packing (training-output layout)
# ---------------------------------------------------------------------------


def pack_shards(
    df: DataFrame,
    budget: int = 2_000,
    col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    bucket_width: int = 1_000,
) -> DataFrame:
    """Assign every document to a training shard so each shard holds
    ~``budget`` tokens: documents are laid out in deterministic
    (split, id) order and shard_id = floor(start_offset / budget).
    Returns (id, split, n_tokens, shard_id).

    The global running sum is computed HIERARCHICALLY — the shape that
    survives 100 TB, where a single ORDER BY window would funnel the
    corpus through one partition:

    1. within-bucket prefix sums (window over (split, id div W) — each
       bucket is at most W rows, partitions stay bounded);
    2. per-bucket totals cumulated across buckets (tiny frame: one row
       per W documents) and broadcast back as bucket offsets;
    3. start = bucket_offset + within_prefix - n_tokens.

    Identical arithmetic to the flat window (integer sums), so the
    DuckDB oracle can use the plain single-window form.
    """
    n_expr = dual.arr_size(dual.tokens(col, dual.SPARK), dual.SPARK)
    bkt = intdiv(id_col, str(bucket_width), dual.SPARK)
    staged = df.selectExpr(
        id_col, split_col, f"{n_expr} AS n_tokens", f"{bkt} AS __b"
    )
    w_in = (
        Window.partitionBy(split_col, "__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = staged.withColumn("__cum", F.sum("n_tokens").over(w_in))
    bucket_totals = staged.groupBy(split_col, "__b").agg(
        F.sum("n_tokens").alias("__bs")
    )
    w_b = (
        Window.partitionBy(split_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = bucket_totals.withColumn(
        "__off", F.sum("__bs").over(w_b) - F.col("__bs")
    ).select(split_col, "__b", "__off")
    return (
        within.join(F.broadcast(offsets), [split_col, "__b"])
        .selectExpr(
            id_col,
            split_col,
            "n_tokens",
            f"{intdiv('__off + __cum - n_tokens', str(budget), dual.SPARK)}"
            " AS shard_id",
        )
    )


def chunk_boundary_stats(
    df: DataFrame,
    ctx: int = 512,
    col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 10_000,
) -> DataFrame:
    """Concat-and-chunk (GPT-style) packing accounting: documents are
    laid out token-contiguously in deterministic id order and cut into
    fixed ``ctx``-token context windows; per document, which window
    its first and last token land in, how many windows it spans, and
    whether a window boundary cuts through it (the attention-broken
    fraction a packing strategy trades against padding waste —
    complements :func:`padding_waste_by_bucket`, which accounts the
    pad-don't-cut alternative).

    Same hierarchical prefix-sum shape as :func:`pack_shards` (bounded
    within-bucket windows + a broadcast bucket-offset frame), so no
    single partition ever sees the whole corpus; the DuckDB oracle
    uses the equivalent flat window. All-integer arithmetic.

    The cross-bucket cumulation IS a global window, but over the
    1-row-per-``bucket_width``-docs totals frame: a corpus/10^4
    reduction, two bigints per row — ~100 GB of 100 TB-scale text
    (~7e10 docs) cumulates over ~7e6 16-byte rows (~100 MB) in one
    task. Audited in `tests/test_plans.py::BOUNDED_GLOBAL_WINDOWS`."""
    n_expr = dual.arr_size(dual.tokens(col, dual.SPARK), dual.SPARK)
    bkt = intdiv(id_col, str(bucket_width), dual.SPARK)
    staged = df.selectExpr(
        id_col, f"{n_expr} AS n_tokens", f"{bkt} AS __b"
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = staged.withColumn("__cum", F.sum("n_tokens").over(w_in))
    bucket_totals = staged.groupBy("__b").agg(
        F.sum("n_tokens").alias("__bs")
    )
    # One row per `bucket_width` documents — tiny, so the single
    # cross-bucket cumulation window is bounded by construction.
    w_b = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bucket_totals.withColumn(
        "__off", F.sum("__bs").over(w_b) - F.col("__bs")
    ).select("__b", "__off")
    start = f"{intdiv('__off + __cum - n_tokens', str(ctx), dual.SPARK)}"
    end = f"{intdiv('__off + __cum - 1', str(ctx), dual.SPARK)}"
    return within.join(F.broadcast(offsets), "__b").selectExpr(
        id_col,
        "CAST(n_tokens AS INT) AS n_tokens",
        f"CAST({start} AS BIGINT) AS start_chunk",
        f"CAST({end} AS BIGINT) AS end_chunk",
        f"CAST({end} - {start} + 1 AS BIGINT) AS chunks_spanned",
        f"({end} > {start}) AS crosses_boundary",
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching: padding-waste accounting
# ---------------------------------------------------------------------------

#: Power-of-two sequence-length bucket boundaries. A CASE ladder, not
#: ceil(log2(n)): float log at exact powers of two rounds differently
#: across engines, and an integer ladder is pure ANSI both sides.
PAD_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def pad_bucket_expr(n_col: str) -> str:
    """SQL CASE assigning a token count to the smallest power-of-two
    bucket that holds it (identical text on Spark and DuckDB)."""
    case = "CASE"
    for b in PAD_BUCKETS:
        case += f" WHEN {n_col} <= {b} THEN {b}"
    return case + f" ELSE {2 * PAD_BUCKETS[-1]} END"


def padding_waste_by_bucket(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per length-bucket padding economics of a training batcher:
    assign every document to its power-of-two token-length bucket and
    report docs, real token mass, padded capacity (bucket width x
    docs — what a fixed-shape batch of this bucket actually computes
    over), and the padding-waste fraction. The standard accounting
    behind length-bucketed batching: compared against ONE global
    max-length bucket, the per-bucket waste is what bucketing saves.

    One column-pruned scan into a partial-agg'd GROUP BY over at most
    ``len(PAD_BUCKETS)+1`` groups — corpus-size-independent output,
    no window, no second pass."""
    staged = df.selectExpr(
        id_col,
        f"{dual.arr_size(dual.tokens(col, dual.SPARK), dual.SPARK)}"
        " AS __n",
    ).selectExpr(id_col, "__n", f"{pad_bucket_expr('__n')} AS bucket")
    return (
        staged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("sum_tokens"),
            (F.count(F.lit(1)) * F.col("bucket"))
            .cast("bigint")
            .alias("capacity"),
        )
        .selectExpr(
            "bucket",
            "n_docs",
            "sum_tokens",
            "capacity",
            "round(1.0 - cast(sum_tokens as double)"
            " / cast(capacity as double), 6) AS waste_frac",
        )
    )

"""Unit tests for the corpus-curation operators (operators/curation.py):
PII redaction, repetition signals, deterministic splits/mixing,
vocabulary, contamination, semantic dedup. The catalog-level oracle
checks run in test_catalog_oracle.py; these pin the operator semantics
on planted fixtures (the synthetic corpus is PII-free, so redaction
behavior is only observable here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_data_pipeline_spark.operators import curation as cur


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "contact alice@example.com or bob.smith@corp.co.uk today"),
        (2, "server at 192.168.0.1 and backup at 10.0.0.254 are up"),
        (3, "call +1 (555) 123-4567 for help"),
        (4, "no sensitive content in this one at all"),
        (5, "mixed: eve@test.org from 8.8.8.8 dialing +44 20 7946 0958"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(pii_docs):
    got = {r.doc_id: r for r in cur.pii_stats(pii_docs).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (2, 0, 0)
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_phone) == (0, 2, 0)
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 1)
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_phone) == (0, 0, 0)
    assert (got[5].n_email, got[5].n_ipv4, got[5].n_phone) == (1, 1, 1)


def test_pii_redaction_replaces_all(pii_docs):
    out = {r.doc_id: r.text for r in cur.redact_pii(pii_docs).collect()}
    assert out[1] == "contact <EMAIL> or <EMAIL> today"
    assert out[2] == "server at <IP> and backup at <IP> are up"
    assert out[3] == "call <PHONE> for help"
    assert out[4] == "no sensitive content in this one at all"
    assert "<EMAIL>" in out[5] and "<IP>" in out[5] and "<PHONE>" in out[5]
    # columns other than text are preserved
    assert set(cur.redact_pii(pii_docs).columns) == {"doc_id", "text"}


def test_repetition_stats_hand_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct, bigrams: only "a a"
            (2, "a b c d"),          # all distinct
            (3, "x"),                # single token -> bigram frac 0 by contract
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cur.repetition_stats(df).collect()}
    assert got[1].dup_token_frac == 0.75       # 1 - 1/4
    assert got[1].dup_bigram_frac == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert got[2].dup_token_frac == 0.0
    assert got[2].dup_bigram_frac == 0.0
    assert got[3].dup_token_frac == 0.0
    assert got[3].dup_bigram_frac == 0.0


@pytest.fixture(scope="module")
def id_range(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_split_disjoint_exhaustive_and_stable(id_range):
    out = cur.hash_split(id_range)
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000          # exhaustive
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    assert 0.06 <= counts["val"] / 2000 <= 0.14
    assert 0.06 <= counts["test"] / 2000 <= 0.14
    # determinism: identical assignment on re-computation
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in cur.hash_split(id_range).collect()}
    assert a == b
    # growth stability: a subset corpus assigns identically
    subset = id_range.where("doc_id < 500")
    c = {r.doc_id: r.split for r in cur.hash_split(subset).collect()}
    assert c == {k: v for k, v in a.items() if k < 500}


def test_hash_split_salt_decorrelates(id_range):
    a = {r.doc_id: r.split for r in cur.hash_split(id_range).collect()}
    b = {
        r.doc_id: r.split
        for r in cur.hash_split(id_range, salt="other").collect()
    }
    assert a != b  # different salt -> different (still valid) split


def test_hash_split_rejects_bad_weights(id_range):
    with pytest.raises(ValueError, match="sum to 1"):
        cur.hash_split(id_range, weights={"train": 0.8, "val": 0.1})


def test_corpus_mix_rates(spark):
    df = (
        spark.range(0, 3000)
        .selectExpr(
            "id AS doc_id",
            "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b'"
            " ELSE 'c' END AS source",
        )
    )
    kept = cur.corpus_mix_sample(df, {"a": 0.1, "b": 0.5})
    counts = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert 0.05 <= counts["a"] / 1000 <= 0.15
    assert 0.42 <= counts["b"] / 1000 <= 0.58
    assert counts["c"] == 1000  # default rate 1.0 keeps everything
    # deterministic: same rows survive a second evaluation
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {
        r.doc_id
        for r in cur.corpus_mix_sample(df, {"a": 0.1, "b": 0.5}).collect()
    }
    assert ids1 == ids2


def test_token_vocab_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b b a a"), (2, "b c c a")], "doc_id long, text string"
    )
    rows = cur.token_vocab(df, k=10).collect()
    assert [(r.token, r.tf, r.df) for r in rows] == [
        ("a", 3, 2),  # tf tie with b broken by token asc
        ("b", 3, 2),
        ("c", 2, 1),
    ]


def test_contamination_planted(spark):
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),   # contained in bench
            (11, "totally unrelated words appear here now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    got = cur.contamination_check(corpus, bench, threshold=0.5).collect()
    assert [(r.corpus_id, r.bench_id) for r in got] == [(10, 1)]
    assert got[0].containment == 1.0  # every corpus shingle is in bench

    # the removal half: the contaminated doc is dropped WITH ITS FULL
    # ROW, the clean one survives untouched
    kept = cur.decontaminate(corpus, bench, threshold=0.5).collect()
    assert [(r.doc_id, r.text) for r in kept] == [
        (11, "totally unrelated words appear here now")
    ]
    # threshold above the planted containment: nothing is removed
    assert cur.decontaminate(corpus, bench, threshold=1.1).count() == 2


def test_contamination_broadcast_guard_fallback_identical(spark):
    """The benchmark-postings broadcast carries a guarded boundedness
    assumption: above max_broadcast_postings the join must FALL BACK
    to a shuffled hash join with identical output (r11 verdict wrong
    #2). Drives both paths on the same inputs and pins the plan
    difference (broadcast vs shuffled postings join)."""
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),
            (11, "totally unrelated words appear here now"),
            (12, "alpha beta gamma delta epsilon zeta eta extra tail"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    bc = cur.contamination_check(
        corpus, bench, threshold=0.5, max_broadcast_postings=1_000_000
    )
    sh = cur.contamination_check(
        corpus, bench, threshold=0.5, max_broadcast_postings=0
    )
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))
    bc_plan = bc._jdf.queryExecution().executedPlan().toString()
    sh_plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bc_plan
    assert "BroadcastHashJoin" not in sh_plan
    assert "ShuffledHashJoin" in sh_plan
    # the removal half inherits both paths, same survivors
    kept_bc = cur.decontaminate(
        corpus, bench, threshold=0.5, max_broadcast_postings=1_000_000
    ).collect()
    kept_sh = cur.decontaminate(
        corpus, bench, threshold=0.5, max_broadcast_postings=0
    ).collect()
    assert sorted(r.doc_id for r in kept_bc) == [11]
    assert sorted(r.doc_id for r in kept_sh) == [11]


def test_semantic_dedup_clusters(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0], 0),   # near-dup of 0 (same label)
        (2, [0.0, 1.0, 0.0], 0),      # same label, far away
        (3, [0.999, 0.01, 0.0], 1),   # near 0 but different label block
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.vec_id: r for r in cur.semantic_dedup(emb, threshold=0.95).collect()}
    assert got[0].cluster_id == 0 and got[0].is_canonical
    assert got[1].cluster_id == 0 and not got[1].is_canonical
    assert got[2].cluster_id == 2 and got[2].is_canonical
    assert got[3].cluster_id == 3 and got[3].is_canonical  # blocked away
    # downstream keep-list: canonical rows only
    kept = {k for k, v in got.items() if v.is_canonical}
    assert kept == {0, 2, 3}


def test_per_source_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three", "s1", "en"),
            (2, "four five", "s1", "de"),
            (3, "six", "s2", "en"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    got = {r.source: r for r in cur.per_source_stats(df).collect()}
    assert got["s1"].n_docs == 2
    assert got["s1"].total_tokens == 5
    assert got["s1"].n_langs == 2
    assert got["s2"].avg_tokens == 1.0


def test_unigram_logprob_score(spark):
    # "common common common" docs must score higher (less negative)
    # than a doc of hapax tokens; n_tokens counts per doc.
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rare1"),
            (3, "rare2 rare3 rare4"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cur.unigram_logprob_score(df).collect()}
    assert got[1].n_tokens == 4 and got[3].n_tokens == 3
    assert got[1].avg_logp > got[2].avg_logp > got[3].avg_logp
    assert all(got[i].avg_logp < 0 for i in (1, 2, 3))


def test_domain_cap_keeps_at_most_cap_per_source(spark):
    rows = [(i, f"doc {i}", f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = cur.domain_cap(df, cap=4).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r)
    assert set(per) == {"s0", "s1", "s2"}
    for rows_ in per.values():
        assert len(rows_) == 4
        assert sorted(r.cap_rank for r in rows_) == [1, 2, 3, 4]
    # determinism: same hash ranking on a re-run and under repartition
    again = cur.domain_cap(df.repartition(7), cap=4).collect()
    assert sorted((r.doc_id, r.source) for r in out) == sorted(
        (r.doc_id, r.source) for r in again
    )


def test_domain_cap_small_source_survives_whole(spark):
    df = spark.createDataFrame(
        [(1, "a", "tiny"), (2, "b", "tiny")],
        "doc_id long, text string, source string",
    )
    assert cur.domain_cap(df, cap=10).count() == 2


def test_chunk_docs_cover_and_overlap(spark):
    # 10 tokens, chunk 4, stride 3 -> n_chunks = 1 + ceil(6/3) = 3
    # chunk 0: t1-4, chunk 1: t4-7, chunk 2: t7-10
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 11)))],
        "doc_id long, text string",
    )
    out = sorted(
        cur.chunk_docs(df, chunk_len=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in out] == [4, 4, 4]
    # overlap check via direct md5 of the expected token spans
    import hashlib

    expect = [
        "t1 t2 t3 t4",
        "t4 t5 t6 t7",
        "t7 t8 t9 t10",
    ]
    assert [r.chunk_md5 for r in out] == [
        hashlib.md5(s.encode()).hexdigest() for s in expect
    ]


def test_chunk_docs_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "only")], "doc_id long, text string"
    )
    out = cur.chunk_docs(df, chunk_len=8, stride=8).collect()
    got = {r.doc_id: r for r in out}
    assert len(out) == 2
    assert got[1].n_chunk_tokens == 2 and got[2].n_chunk_tokens == 1


def test_chunk_docs_exact_boundary_no_empty_tail(spark):
    # n == chunk_len + k*stride must not create an empty trailing chunk
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 9)))],  # 8 tokens
        "doc_id long, text string",
    )
    out = cur.chunk_docs(df, chunk_len=4, stride=4).collect()
    assert sorted(r.n_chunk_tokens for r in out) == [4, 4]


def test_chunk_docs_rejects_bad_stride(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cur.chunk_docs(df, chunk_len=4, stride=5)
    with pytest.raises(ValueError):
        cur.chunk_docs(df, chunk_len=4, stride=0)


def test_incremental_dedup_vs_index_and_within_batch(spark):
    index = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "alpha"),   # dropped: already in index
            (11, "gamma"),   # kept (first occurrence in batch)
            (12, "gamma"),   # dropped: dup within batch
            (13, "delta"),   # kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in cur.incremental_dedup(new, index).collect()
    )
    assert kept == [11, 13]


def test_weighted_sample_exact_count_and_determinism(spark):
    rows = [(i, f"s{i % 4}", 10 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = cur.weighted_sample(
        df, k=3, weight_expr="n_chars", stratum_col="lang"
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r)
    assert all(len(v) == 3 for v in per.values()) and len(per) == 4
    assert all(r.es_key < 0 for r in out)  # ln(u in (0,1]) <= 0
    again = cur.weighted_sample(
        df.repartition(11), k=3, weight_expr="n_chars", stratum_col="lang"
    ).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_weighted_sample_prefers_heavy_weights(spark):
    # one document a million times heavier than the rest: its ES key
    # ln(u)/w is ~0 (the max) for any u, so it must be sampled first.
    rows = [(i, 1) for i in range(50)] + [(99, 1_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    top = cur.weighted_sample(df, k=1, weight_expr="w").collect()
    assert [r.doc_id for r in top] == [99]


def test_tfidf_discounts_ubiquitous_terms(spark):
    # 'the' appears in every doc -> idf = ln(4/4) = 0 -> score 0,
    # outranked by slice-specific terms despite the highest raw tf.
    import math

    df = spark.createDataFrame(
        [
            (1, "the cat cat", "en"),
            (2, "the dog", "en"),
            (3, "the hund", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = cur.tfidf_top_terms(df, k=5).collect()
    en = [(r.token, r.tf, r.df, r.tfidf) for r in rows if r.lang == "en"]
    ln2 = math.log((3 + 1) / (1 + 1))
    assert en == [
        ("cat", 2, 1, round(2 * ln2, 6)),
        ("dog", 1, 1, round(ln2, 6)),
        ("the", 2, 3, 0.0),  # tf is per-slice (en only); df is corpus-wide
    ]
    de = [(r.token, r.tfidf) for r in rows if r.lang == "de"]
    assert de == [("hund", round(ln2, 6)), ("the", 0.0)]


def test_quality_buckets_balanced_and_ordered(spark):
    # Percentile boundaries must yield near-equal tiers on the
    # fixture, tiers must be contiguous in score (max of tier i <=
    # min of tier i+1 — rounded boundaries may touch), and every doc
    # lands exactly once.
    from hadoop_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = {r.bucket: r for r in cur.quality_bucket_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    n = docs.count()
    assert sum(r.n_docs for r in rows.values()) == n
    for b, r in rows.items():
        assert abs(r.n_docs - n / 5) <= 0.2 * n / 5, (b, r.n_docs)
    for b in range(1, 5):
        assert rows[b].max_logp <= rows[b + 1].min_logp + 1e-9, b


def test_tokenizer_fertility_hand_values(spark):
    # "ab cd" -> 2 words, 2 subtokens, 4 chars; "a-b x!" -> 2 words
    # but 5 subtokens (a, -, b, x, !): fertility exposes the
    # punctuation-splitting cost per language.
    # The catalog form (tokenizer_fertility_by_lang) is oracle-checked
    # on the fixtures; this pins the shared expressions' hand values
    # on a planted frame.
    from hadoop_data_pipeline_spark.functions import dual
    from hadoop_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [("en", "ab cd"), ("xx", "a-b x!")], "lang string, text string"
    )
    staged = df.selectExpr(
        "lang", "text", f"{dual.tokens('text', dual.SPARK)} AS __toks"
    )
    ex = tx.token_stats_exprs("text", "__toks", dual.SPARK)
    got = {
        r.lang: r
        for r in staged.selectExpr(
            "lang",
            f"{ex['n_tokens']} AS n_tok",
            f"{ex['n_subtokens']} AS n_sub",
        ).collect()
    }
    assert (got["en"].n_tok, got["en"].n_sub) == (2, 2)   # fertility 1.0
    assert (got["xx"].n_tok, got["xx"].n_sub) == (2, 5)   # fertility 2.5


def test_sql_str_lit_escapes_quotes():
    assert cur.sql_str_lit("en") == "'en'"
    assert cur.sql_str_lit("o'brien") == "'o''brien'"
    assert cur.sql_str_lit("a''b") == "'a''''b'"


def test_mixture_budget_plan_quoted_key_and_empty_weights(spark):
    # a slice key containing a quote must not break (or silently
    # alter) the generated CASE expression
    df = spark.createDataFrame(
        [("o'brien", "one two three"), ("en", "four five")],
        "lang string, text string",
    )
    got = {
        r.lang: r
        for r in cur.mixture_budget_plan(
            df, {"o'brien": 0.75, "en": 0.25}, total_budget=100
        ).collect()
    }
    assert got["o'brien"].weight == 0.75
    assert got["o'brien"].target_tokens == 75
    assert got["en"].target_tokens == 25
    with pytest.raises(ValueError, match="empty"):
        cur.mixture_budget_plan(df, {}, total_budget=100)


def test_case_builders_quoting_and_empty_edges(spark):
    # mix_rate_case_expr: empty rates -> plain default literal (a CASE
    # with zero WHEN arms is invalid SQL); quoted source name survives
    assert cur.mix_rate_case_expr("src", {}, 0.5) == str(
        int(0.5 * cur.SPLIT_BUCKETS)
    )
    expr = cur.mix_rate_case_expr("src", {"it's": 1.0}, 0.0)
    df = spark.createDataFrame([("it's",), ("other",)], "src string")
    got = {r.src: r.rate for r in df.selectExpr("src", f"{expr} AS rate").collect()}
    assert got["it's"] == cur.SPLIT_BUCKETS and got["other"] == 0

    # split_case_expr: empty -> ValueError; single split -> bare literal
    with pytest.raises(ValueError, match="empty"):
        cur.split_case_expr("b", {})
    assert cur.split_case_expr("b", {"all": 1.0}) == "'all'"
    quoted = cur.split_case_expr("b", {"tr'n": 0.5, "test": 0.5})
    got2 = df.selectExpr(f"{quoted.replace('b <', '0 <')} AS s").collect()
    assert {r.s for r in got2} == {"tr'n"}


def test_padding_waste_by_bucket_math(spark):
    """Hand-checked bucket assignment and waste math: the CASE ladder
    sends n to the smallest power-of-two bucket >= n, capacity =
    bucket * docs, waste = 1 - sum/capacity."""
    df = spark.createDataFrame(
        [
            (0, " ".join(["a"] * 10)),   # 10 tokens -> bucket 16
            (1, " ".join(["a"] * 16)),   # exactly 16 -> bucket 16
            (2, " ".join(["a"] * 17)),   # 17 -> bucket 32
        ],
        "doc_id long, text string",
    )
    got = {r.bucket: r for r in cur.padding_waste_by_bucket(df).collect()}
    assert set(got) == {16, 32}
    b16 = got[16]
    assert (b16.n_docs, b16.sum_tokens, b16.capacity) == (2, 26, 32)
    assert b16.waste_frac == round(1 - 26 / 32, 6)
    b32 = got[32]
    assert (b32.n_docs, b32.sum_tokens, b32.capacity) == (1, 17, 32)


def test_epoch_shuffle_deterministic_complete_and_epoch_varying(spark):
    """epoch_shuffle contract: (a) re-running an epoch reproduces the
    exact (shard, shard_rank) assignment, (b) every doc appears
    exactly once and each shard's ranks are contiguous 1..n, (c) a
    different epoch yields a different permutation."""
    from hadoop_data_pipeline_spark.operators import layout

    docs = spark.range(0, 200).selectExpr("id AS doc_id")
    e1a = layout.epoch_shuffle(docs, epoch=1, n_shards=4).collect()
    e1b = layout.epoch_shuffle(docs, epoch=1, n_shards=4).collect()
    assert sorted(map(tuple, e1a)) == sorted(map(tuple, e1b))
    assert len(e1a) == 200
    by_shard: dict[int, list[int]] = {}
    for r in e1a:
        by_shard.setdefault(r.shard, []).append(r.shard_rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    e2 = layout.epoch_shuffle(docs, epoch=2, n_shards=4).collect()
    assert sorted(map(tuple, e2)) != sorted(map(tuple, e1a))

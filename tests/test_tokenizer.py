"""BPE tokenizer training + encoding (operators/tokenizer.py):
the textbook corpus must reproduce the known merge sequence, encoding
must invert to the original text, and training must be deterministic
under repartitioning."""

from __future__ import annotations

from hadoop_data_pipeline_spark.operators import tokenizer as tok


def _toy(spark):
    # the classic BPE demonstration corpus (Sennrich et al. figure):
    # {low:5, lower:2, newest:6, widest:3}
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(0, text)], "doc_id bigint, text string")


def test_bpe_learns_textbook_merges(spark):
    freqs = tok.word_frequencies(_toy(spark))
    merges = tok.bpe_train(freqs, n_merges=4)
    # 'est</w>' dominates (newest 6 + widest 3 = 9). The pairs
    # (t,</w>), (s,t), (e,s) all tie at 9; the documented
    # lexicographic tie-break resolves right-to-left, so the suffix
    # assembles as t</w> -> st</w> -> est</w>, then the 7-count
    # (o,w)/(l,o) tie picks (o,w). Same token set as the textbook
    # figure, deterministic order.
    assert merges[:4] == [
        ("t", tok.EOW),
        ("s", "t" + tok.EOW),
        ("e", "st" + tok.EOW),
        ("o", "w"),
    ]


def test_bpe_encode_roundtrip_and_compression(spark):
    df = _toy(spark)
    merges = tok.bpe_train(tok.word_frequencies(df), n_merges=10)
    out = tok.bpe_encode(df, merges).collect()[0]
    # tokens concatenate back to the original words (EOW marks ends)
    joined = "".join(out.tokens).replace(tok.EOW, " ").strip()
    assert joined == df.collect()[0].text
    # merges actually compress vs character-level
    n_chars = sum(len(w) + 1 for w in df.collect()[0].text.split())
    assert out.n_tokens < n_chars


def test_bpe_training_deterministic_under_partitioning(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    m1 = tok.bpe_train(tok.word_frequencies(docs), n_merges=20)
    m2 = tok.bpe_train(
        tok.word_frequencies(docs.repartition(7)), n_merges=20
    )
    assert m1 == m2 and len(m1) == 20


def test_bpe_train_spark_equals_driver_trainer(spark):
    """The distributed trainer (one Spark job per merge round, 1-row
    argmax sync) must produce the IDENTICAL merge list as the driver
    loop — on the textbook corpus (exercising the lexicographic
    tie-break through struct-max) AND on a real fixture slice
    (exercising the aggregate-fold merge application across rounds)."""
    toy_freqs = tok.word_frequencies(_toy(spark))
    assert tok.bpe_train_spark(toy_freqs, n_merges=8) == tok.bpe_train(
        toy_freqs, n_merges=8
    )
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(150)
    freqs = tok.word_frequencies(docs)
    m_spark = tok.bpe_train_spark(freqs, n_merges=24)
    m_driver = tok.bpe_train(freqs, n_merges=24)
    assert m_spark == m_driver and len(m_spark) == 24


def test_bpe_train_spark_min_freq_early_stop(spark):
    """min_freq stops BOTH trainers at the same round."""
    df = spark.createDataFrame(
        [(0, "ab ab cd")], "doc_id bigint, text string"
    )
    freqs = tok.word_frequencies(df)
    assert tok.bpe_train_spark(freqs, n_merges=10, min_freq=2) == (
        tok.bpe_train(freqs, n_merges=10, min_freq=2)
    )

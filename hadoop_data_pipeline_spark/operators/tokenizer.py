"""BPE tokenizer training + encoding over a document corpus.

The canonical training-data-pipeline op the catalog still lacked:
learn a byte-pair-encoding merge table from the corpus, then tokenize
with it (the sennrich-style algorithm every modern subword tokenizer
descends from; public references: Sennrich et al. 2016, the
HuggingFace tokenizers docs).

Spark-first split of the work, stated explicitly:

* **Corpus-scale part — distributed.** Word frequencies are ONE
  shuffle over the corpus (`word_frequencies`): explode whitespace
  tokens, partial-agg count. 100 TB of text passes through exactly
  once.
* **Merge loop — two interchangeable paths producing the IDENTICAL
  model (test-pinned equality).** `bpe_train` collects the
  vocab-bounded frequency table (`max_vocab` caps the collect
  explicitly) and merges in driver memory — right when the table is
  a few MB, exactly how production trainers consume a pre-aggregated
  count file. `bpe_train_spark` (r13) keeps the table distributed:
  one Spark job per merge round (pair explode -> partial agg ->
  1-row argmax sync; the driver holds only the merge list) over a
  persisted symbol frame re-persisted per round — right when the
  vocabulary itself is too large to collect (fastText-scale 2^20+
  words). Corpus pass count is 1 in BOTH paths; the loop runs over
  the frequency table, never the corpus.
* **Encoding — distributed again.** `bpe_encode` applies the learned
  merge ranks inside an Arrow-batched pandas UDF: per-row greedy
  lowest-rank merging, zero shuffle, corpus-parallel.

Determinism: pair selection breaks count ties lexicographically, so
the merge table is a pure function of the corpus — retries and
different partitionings cannot change it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel, kept out of the corpus alphabet.
EOW = "</w>"


def word_frequencies(
    df: DataFrame, col: str = "text", max_vocab: int = 1_000_000
) -> DataFrame:
    """Distributed (word, freq) table: the only corpus-scale pass of
    BPE training. One explode + one partial-agg shuffle; the top
    ``max_vocab`` words by (freq desc, word) keep the table — and the
    later driver collect — explicitly bounded."""
    words = df.select(
        F.explode(F.split(F.trim(F.col(col)), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    freqs = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    return freqs.orderBy(F.desc("freq"), "word").limit(max_vocab)


def bpe_train(
    word_freqs: DataFrame, n_merges: int = 100, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) frame.

    Collects the vocab-bounded table (see module docstring) and runs
    the classic algorithm: words start as character sequences ending
    in EOW; each round counts adjacent symbol pairs weighted by word
    frequency, merges the most frequent pair (ties: lexicographic),
    and stops early when the best pair drops under ``min_freq``.
    Returns the ordered merge list — the entire trained model.
    """
    return _bpe_train_rows(word_freqs.collect(), n_merges, min_freq)


def _bpe_train_rows(
    rows, n_merges: int = 100, min_freq: int = 2
) -> list[tuple[str, str]]:
    """The classic driver-side BPE loop over already-collected
    (word, freq) rows — split out so :func:`bpe_train_auto` can feed
    it the rows its bounded probe already fetched instead of
    re-running the frequency pipeline for a second collect."""
    seqs: list[tuple[list[str], int]] = [
        (list(r["word"]) + [EOW], int(r["freq"])) for r in rows
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, freq in seqs:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        (a, b), freq = best
        if freq < min_freq:
            break
        merges.append((a, b))
        merged = a + b
        new_seqs = []
        for sym, f in seqs:
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs.append((out, f))
        seqs = new_seqs
    return merges


def bpe_train_spark(
    word_freqs: DataFrame, n_merges: int = 100, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Distributed BPE training: identical merges to :func:`bpe_train`
    (test-pinned equality), with the per-round adjacent-pair count
    pushed into Spark (r12 verdict #5 — the driver loop was the
    slowest driver-side loop in the repo, and at fastText-scale
    vocabularies a 1-10M-row symbol table stops being collectable).

    Pass accounting, stated exactly:

    * corpus: ZERO additional passes (input is the already-aggregated
      ``word_frequencies`` table — the corpus was scanned once).
    * per merge round: ONE Spark job over the persisted symbol frame —
      adjacent pairs explode from each word's symbol array, partial-
      aggregate on (a, b), and a single ``max(struct(cnt, a, b))``
      reduce returns the argmax pair. The driver receives ONE ROW per
      round (the MLlib treeAggregate precedent); the model it
      accumulates is just the merge list.
    * merge application is a lazy column rewrite (an ``aggregate``
      fold over the symbol array — provably equivalent to the
      sequential left-to-right scan because a merged token ``a+b``
      can never equal its own left side ``a``, so it cannot cascade
      within a round); each round re-persists the tiny frame and
      unpersists its parent, keeping lineage flat and memory bounded
      by the vocab cap.

    Tie-break parity: Python's ``max`` on ``(count, (a, b))`` equals
    Spark's ``max(struct(cnt, a, b))`` because struct ordering is
    field-by-field and Spark's UTF8 binary string order equals
    Python's code-point order (UTF-8 byte order is code-point order).

    Use this path when the vocabulary is too large to collect; for
    small vocabularies :func:`bpe_train` avoids ``n_merges`` rounds of
    scheduler overhead. Both produce the identical model.
    """
    syms = word_freqs.select(
        F.col("freq").cast("long").alias("freq"),
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    ).persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = syms.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(x, i) -> struct(x AS a, "
                        "element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
            ).select("freq", "p.a", "p.b")
            best_row = (
                pairs.groupBy("a", "b")
                .agg(F.sum("freq").alias("cnt"))
                .agg(F.max(F.struct("cnt", "a", "b")).alias("best"))
                .collect()[0]["best"]
            )
            if best_row is None or best_row["cnt"] < min_freq:
                break
            a, b = best_row["a"], best_row["b"]
            merges.append((a, b))
            merged = a + b

            def make_step(a: str, b: str, merged: str):
                def step(acc, x):
                    hit = (
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(a))
                        & (x == F.lit(b))
                    )
                    return F.when(
                        hit,
                        F.concat(
                            F.slice(acc, F.lit(1), F.size(acc) - 1),
                            F.array(F.lit(merged)),
                        ),
                    ).otherwise(F.concat(acc, F.array(x)))

                return step

            nxt = syms.select(
                "freq",
                F.aggregate(
                    "syms",
                    F.array().cast("array<string>"),
                    make_step(a, b, merged),
                ).alias("syms"),
            ).persist()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


def bpe_train_auto(
    word_freqs: DataFrame,
    n_merges: int = 100,
    min_freq: int = 2,
    collect_threshold: int = 100_000,
) -> list[tuple[str, str]]:
    """Adaptive trainer (the ``connected_components`` driver/
    distributed precedent): probe the vocab table with ONE bounded
    collect of at most ``collect_threshold + 1`` rows — if the limit
    was not hit we already hold the WHOLE table and the driver loop
    runs on it directly (no per-round scheduler overhead), above it
    the Spark-round trainer keeps the table distributed. The earlier
    count()-then-collect form ran the corpus-scale frequency pipeline
    TWICE (r16; the ``connected_components`` edge probe had the same
    fix); the single probe halves that to the one unavoidable pass.
    Both paths produce the identical model (``tests/test_tokenizer.py``
    pins equality), so the switch is a pure cost decision, decided by
    a measurement, not a guess."""
    probe = word_freqs.limit(collect_threshold + 1).collect()
    if len(probe) <= collect_threshold:
        return _bpe_train_rows(probe, n_merges, min_freq)
    return bpe_train_spark(word_freqs, n_merges, min_freq)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a trained merge table — distributed, zero
    shuffle. Each word re-plays the merges in RANK order (lowest-rank
    adjacent pair first, the standard BPE inference rule, equivalent
    to training order on the training corpus). Returns (id, n_tokens,
    tokens array)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)

    def encode_word(word: str) -> list[str]:
        sym = list(word) + [EOW]
        r = b_ranks.value
        while len(sym) > 1:
            pairs = [
                (r[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in r
            ]
            if not pairs:
                break
            _, i = min(pairs)
            sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2 :]
        return sym

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tokens_udf(s: pd.Series) -> pd.Series:
        import re

        # per-executor memo on DISTINCT words: natural corpora repeat
        # words constantly (Zipf), so the greedy merge loop runs once
        # per distinct word per worker, not once per occurrence.
        memo: dict[str, list[str]] = {}

        def one(t: str | None) -> list[str]:
            if t is None:
                return []
            out: list[str] = []
            for w in re.split(r"\s+", t.strip()):
                if not w:
                    continue
                enc = memo.get(w)
                if enc is None:
                    enc = encode_word(w)
                    memo[w] = enc
                out.extend(enc)
            return out

        return s.map(one)

    out = df.select(
        id_col, tokens_udf(F.col(col)).alias("tokens")
    )
    return out.select(
        id_col, F.size("tokens").alias("n_tokens"), "tokens"
    )

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
* **Merge loop — driver-side, and that is the right design.** BPE
  merges operate on the word-FREQUENCY table, whose size is bounded
  by vocabulary (~1-10M rows), not by corpus bytes; every merge
  iteration rewrites pair counts touched by one merged pair. Running
  1000 merge rounds as 1000 Spark jobs over a few-MB table would be
  pure scheduler overhead — the bounded table is collected once
  (`max_vocab` caps it explicitly, most-frequent-first, so the
  collect is budgeted, not open-ended) and merged in memory, exactly
  how production tokenizer trainers consume a pre-aggregated count
  file.
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
    rows = word_freqs.collect()
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

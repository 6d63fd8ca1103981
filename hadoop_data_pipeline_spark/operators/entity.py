"""Entity resolution (north-star extension): blocked fuzzy matching.

Near-duplicate *entities* (product names, vendor records, author
strings) differ from near-duplicate documents: the unit is a short
string and the similarity is edit distance, not shingle overlap. The
classic scale recipe is block -> band -> verify:

1. BLOCK on a cheap deterministic key (here: the name's last word) so
   candidate generation is an equi hash join, never a cross join;
2. prune candidates with a LOSSLESS length band — ``|len(a) - len(b)|
   <= d`` is a necessary condition for ``levenshtein(a, b) <= d`` (each
   edit changes the length by at most one), so no true pair is lost;
3. VERIFY the survivors with the exact edit distance.

At 100 TB-scale entity tables the single-key blocking generalizes to
multi-pass blocking (union of pairs from several keys: last word,
first word, sorted-token prefix) — each pass is the same equi join;
the union dedups on (id_a, id_b). Everything here is JVM-side
(``levenshtein`` is a codegen'd Catalyst expression), and the shuffle
carries (id, short name, block key) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Last whitespace-delimited word — identical semantics in Spark and
#: DuckDB (`regexp_extract(name, '[^ ]+$')`), used by the oracle too.
LAST_WORD_RE = "[^ ]+$"


def fuzzy_dup_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 2,
    block_col: str | None = None,
) -> DataFrame:
    """Blocked edit-distance near-dup pairs over DISTINCT names:
    (name_a, name_b, rep_id_a, rep_id_b, n_a, n_b, edit_dist) for
    every same-block distinct-name pair with ``levenshtein <=
    max_dist``, ordered ``rep_id_a < rep_id_b``. ``rep_id`` is the
    min record id carrying the name (deterministic representative),
    ``n`` the record count — mapping members back to a matched pair
    is one hash join on the name.

    CANONICALIZE-FIRST is the load-bearing scale decision: entity
    tables repeat the same strings enormously (here 20k parts share
    64 names; a 100 TB vendor table repeats millions of rows per
    vendor), and edit distance on raw rows is quadratic in GROUP
    sizes — the distinct-name frame is smaller by the duplication
    factor and the pair count drops by its square. The earlier
    row-level form of this operator was measured 29 s / 5.5M output
    rows at sf0.1; this form is sub-second with 231 rows from the
    identical match predicate.

    ``block_col``: optional existing blocking column; defaults to the
    name's last word (good for 'modifier noun' product names — the
    head noun is the stable part, typos live in the modifier).

    Plan shape: one partial-agg shuffle on the name (the
    canonicalization), then an equi hash join on the block key over
    the distinct-name frame; the lossless length band (`|len(a) -
    len(b)| <= d` is necessary for ``levenshtein <= d``) prunes
    before the edit distance runs. No cross join at any scale.
    """
    aggs = [F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n")]
    if block_col:
        canon = df.groupBy(
            F.col(name_col).alias("name"), F.col(block_col).alias("__blk")
        ).agg(*aggs)
    else:
        canon = df.groupBy(F.col(name_col).alias("name")).agg(*aggs).withColumn(
            "__blk", F.regexp_extract(F.col("name"), LAST_WORD_RE, 0)
        )
    canon = canon.withColumn("__len", F.length("name"))
    a = canon.select(
        F.col("name").alias("name_a"),
        F.col("rep_id").alias("rep_id_a"),
        F.col("n").alias("n_a"),
        F.col("__blk"),
        F.col("__len").alias("__len_a"),
    )
    b = canon.select(
        F.col("name").alias("name_b"),
        F.col("rep_id").alias("rep_id_b"),
        F.col("n").alias("n_b"),
        F.col("__blk"),
        F.col("__len").alias("__len_b"),
    )
    pairs = a.join(b, "__blk").where(
        (F.col("rep_id_a") < F.col("rep_id_b"))
        & (F.abs(F.col("__len_a") - F.col("__len_b")) <= max_dist)
    )
    return (
        pairs.withColumn(
            "edit_dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .where(F.col("edit_dist") <= max_dist)
        .select(
            "name_a", "name_b", "rep_id_a", "rep_id_b", "n_a", "n_b",
            "edit_dist",
        )
    )

"""Dual-dialect expression builders.

Every extension operator (dedup, similarity, text analysis) is defined
once as arithmetic over md5-based hashes and list operations, then
rendered into BOTH Spark SQL and DuckDB SQL from the same constants.
That is what makes the operators oracle-checkable: the Spark DataFrame
plan and the DuckDB oracle compute the *identical* deterministic
function, so the driver's value-hash comparison is exact (no float
"tolerance", no seeded randomness).

Primitives verified equivalent across engines (see tests):
* ``md5(string)`` — identical hex in Spark and DuckDB.
* hex->bigint — Spark ``conv(hex, 16, 10)``, DuckDB ``CAST('0x'||hex)``.
* list fold — Spark ``aggregate(...)``, DuckDB ``list_reduce`` with the
  initial value prepended (DuckDB 1.0 has no init parameter); both fold
  left-to-right, so double accumulation is bit-identical.

STAGING RULE (the performance contract): every builder here takes
*column references*, not inline expressions. Expensive arrays (tokens,
shingles, hash arrays) must be materialized as named columns in a
prior projection — on the Spark side via chained ``selectExpr`` (a
lambda body that inlines ``split(text)`` re-evaluates the regex split
once per array index; staging keeps it at once per row), and on the
DuckDB side via chained CTEs. Helpers for both stagings live at the
bottom.

Scale note: everything here is JVM-side Catalyst expressions on the
Spark side — no Python UDFs — so the hot path stays inside whole-stage
codegen and Arrow never enters the picture.
"""

from __future__ import annotations

import random

SPARK = "spark"
DUCK = "duck"

#: Modulus for affine minhash permutations (fits 31 bits; a*h stays
#: well under 2^63 for 28-bit base hashes).
MINHASH_P = 2_147_483_647
#: (a, b) affine coefficients — fixed constants shared by both engines.
MINHASH_AB: list[tuple[int, int]] = [
    (2971, 1433),
    (4297, 3571),
    (6397, 2837),
    (8191, 5689),
    (10007, 7919),
    (12289, 9973),
    (14341, 11587),
    (16411, 13499),
]
#: LSH banding: 8 minhashes -> 4 bands of 2 rows.
N_BANDS = 4
BAND_ROWS = 2

#: SimHash width: capped by the 28-bit base token hashes (higher bits
#: of every hash are zero, so wider signatures would carry constant
#: bits). 28 bits / 4 bands = 7-bit band keys -> 128-way candidate
#: bucketing in the near-dup join.
SIMHASH_BITS = 28

#: Deterministic +/-1 hyperplanes for embedding LSH (8 planes x 64 dims).
_rng = random.Random(20260813)
ANN_PLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(64)] for _ in range(8)
]


def hex_int(hexpr: str, dialect: str) -> str:
    """hex string expression -> bigint, identically in both engines."""
    if dialect == SPARK:
        return f"cast(conv({hexpr}, 16, 10) as bigint)"
    return f"CAST('0x' || {hexpr} AS BIGINT)"


def md5_int(expr: str, dialect: str, nhex: int = 7) -> str:
    """Deterministic integer hash of a string expression: the first
    ``nhex`` hex chars of md5 as a bigint (28 bits for nhex=7)."""
    return hex_int(f"substring(md5({expr}), 1, {nhex})", dialect)


def tokens(col: str, dialect: str) -> str:
    """Whitespace tokenization. Stage the result as a column before
    using it in any per-element lambda."""
    if dialect == SPARK:
        return f"split(trim({col}), '\\\\s+')"
    return f"string_split_regex(trim({col}), '\\s+')"


def transform(arr: str, lam: str, dialect: str) -> str:
    fn = "transform" if dialect == SPARK else "list_transform"
    return f"{fn}({arr}, {lam})"


def arr_filter(arr: str, lam: str, dialect: str) -> str:
    fn = "filter" if dialect == SPARK else "list_filter"
    return f"{fn}({arr}, {lam})"


def arr_size(arr: str, dialect: str) -> str:
    fn = "size" if dialect == SPARK else "len"
    return f"{fn}({arr})"


def arr_min(arr: str, dialect: str) -> str:
    fn = "array_min" if dialect == SPARK else "list_min"
    return f"{fn}({arr})"


def arr_distinct(arr: str, dialect: str) -> str:
    fn = "array_distinct" if dialect == SPARK else "list_distinct"
    return f"{fn}({arr})"


def ordered_distinct(arr: str, dialect: str) -> str:
    """First-occurrence-order distinct of a STAGED array column,
    identical in both engines: keep element x at position i iff the
    array's first occurrence of x IS i. (Spark's ``array_distinct``
    documents first-occurrence order, but DuckDB's ``list_distinct``
    does not guarantee order — the mirrored index-lambda form is
    order-deterministic in both.) O(n²) per row; for the within-doc
    units this is applied to (tokens/sentences), n is small and
    per-row — embarrassingly parallel, no shuffle."""
    if dialect == SPARK:
        return f"filter({arr}, (x, i) -> array_position({arr}, x) = i + 1)"
    return f"list_filter({arr}, (x, i) -> list_position({arr}, x) = i)"


def element(arr: str, idx: str, dialect: str) -> str:
    """1-based element access in both engines. Spark's ``element_at``
    requires an INT index while expressions derived from ``div`` /
    ``sequence`` arithmetic widen to BIGINT, so the index is always
    cast (a no-op when it is already INT)."""
    if dialect == SPARK:
        return f"element_at({arr}, cast(({idx}) as int))"
    return f"{arr}[{idx}]"


def index_range(lo: str, hi_inclusive: str, dialect: str) -> str:
    """Integer sequence [lo, hi] (inclusive) in both engines."""
    if dialect == SPARK:
        return f"sequence({lo}, {hi_inclusive})"
    return f"range({lo}, ({hi_inclusive}) + 1)"


def fold(arr: str, init: str, lam: str, dialect: str) -> str:
    """Left fold. DuckDB 1.0's list_reduce lacks an init parameter, so
    the initial value is prepended (both folds are left-to-right)."""
    if dialect == SPARK:
        return f"aggregate({arr}, {init}, {lam})"
    return f"list_reduce(list_prepend({init}, {arr}), {lam})"


# ---------------------------------------------------------------------------
# Staged text expressions — each takes COLUMN REFERENCES produced by an
# earlier projection/CTE, never inline expensive expressions.
# ---------------------------------------------------------------------------


def shingles_from_tokens(
    toks_col: str, dialect: str, n: int = 2, distinct: bool = True
) -> str:
    """n-word shingles (default bigrams, default DISTINCT) from a
    staged tokens column; ``distinct=False`` keeps every occurrence
    (needed when counting shingle frequency, e.g. the top-n-gram
    repetition signal). Documents with < n tokens yield an empty list
    in both engines — Spark needs an explicit guard because
    ``sequence(1, 0)`` counts DOWN (DuckDB's ``range(1, 1)`` is
    empty)."""
    k = n - 1
    size = arr_size(toks_col, dialect)
    idx = index_range("1", f"{size} - {k}", dialect)
    parts = ", ".join(element(toks_col, f"i + {j}", dialect) for j in range(n))
    shingle = f"concat_ws(' ', {parts})"
    base = transform(idx, f"i -> {shingle}", dialect)
    if distinct:
        base = arr_distinct(base, dialect)
    if dialect == SPARK:
        return (
            f"(CASE WHEN {size} <= {k} THEN cast(array() as array<string>)"
            f" ELSE {base} END)"
        )
    return base


def hash_array(arr_col: str, dialect: str) -> str:
    """28-bit md5 hash of every element of a staged string array."""
    return transform(arr_col, f"s -> {md5_int('s', dialect)}", dialect)


def minhash_from_hashes(hash_col: str, k: int, dialect: str) -> str:
    """k-th minhash value from a staged hash-array column: min over
    (a*h + b) mod P. NULL for empty arrays (both engines agree)."""
    a, b = MINHASH_AB[k]
    return arr_min(
        transform(hash_col, f"h -> ({a} * h + {b}) % {MINHASH_P}", dialect),
        dialect,
    )


def simhash_from_hashes(arr_col: str, dialect: str, bits: int = SIMHASH_BITS) -> str:
    """SimHash from a staged token-hash array column: bit i is the sign
    of sum(+/-1 per token by hash bit i); rendered as ``bits`` explicit
    terms (no nested lambda over the bit index — DuckDB 1.0 lambdas
    can't reference an outer lambda variable reliably)."""
    terms = []
    for i in range(bits):
        contrib = transform(
            arr_col,
            f"h -> cast(((h >> {i}) & 1) * 2 - 1 as bigint)",
            dialect,
        )
        total = fold(contrib, "cast(0 as bigint)", "(acc, x) -> acc + x", dialect)
        terms.append(f"(CASE WHEN ({total}) > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def fingerprint_from_hashes(hash_col: str, dialect: str) -> str:
    """Order-sensitive document fingerprint from a staged token-hash
    array: left fold with acc' = (31*acc + h) mod P (rolling hash)."""
    return fold(
        hash_col,
        "cast(7 as bigint)",
        f"(acc, h) -> (31 * acc + h) % {MINHASH_P}",
        dialect,
    )


# ---------------------------------------------------------------------------
# Embedding expressions (operate on staged vector columns, which are
# already plain columns in the data — no staging needed)
# ---------------------------------------------------------------------------


def dot(a: str, b: str, dialect: str) -> str:
    """Sequential-fold dot product of two float vectors in double
    precision — bit-identical across engines because the element order
    and accumulation order are identical."""
    if dialect == SPARK:
        prods = f"zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double))"
    else:
        prods = (
            f"list_transform(list_zip({a}, {b}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
        )
    return fold(prods, "cast(0.0 as double)", "(acc, v) -> acc + v", dialect)


def norm(a: str, dialect: str) -> str:
    sq = transform(a, "x -> cast(x as double) * cast(x as double)", dialect)
    return f"sqrt({fold(sq, 'cast(0.0 as double)', '(acc, v) -> acc + v', dialect)})"


def cosine(a: str, b: str, dialect: str, decimals: int = 6) -> str:
    return f"round(({dot(a, b, dialect)}) / (({norm(a, dialect)}) * ({norm(b, dialect)})), {decimals})"


def cosine_staged(a: str, b: str, na: str, nb: str, dialect: str, decimals: int = 6) -> str:
    """Cosine with the norms STAGED as per-row columns (computed once
    per vector, not once per pair). Bit-identical to :func:`cosine`
    because the staged norm is the same expression with the same
    evaluation order — only cached."""
    return f"round(({dot(a, b, dialect)}) / ({na} * {nb}), {decimals})"


def plane_literal(plane: list[int], dialect: str) -> str:
    vals = ", ".join(str(v) for v in plane)
    return f"array({vals})" if dialect == SPARK else f"[{vals}]"


def ann_bucket(a: str, dialect: str) -> str:
    """Random-hyperplane LSH bucket id (8 deterministic planes -> 256
    buckets): bit j = sign(plane_j . v)."""
    terms = []
    for j, plane in enumerate(ANN_PLANES):
        d = dot(a, plane_literal(plane, dialect), dialect)
        terms.append(f"(CASE WHEN ({d}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Staging helpers
# ---------------------------------------------------------------------------


def stage_spark_shingle_hashes(df, text_col: str, keep: list[str]):
    """Spark: stage text -> __toks -> __sh (shingle-hash array) as
    chained projections, keeping ``keep`` columns. Each stage
    references the previous stage's column once (or per-element as a
    cheap column ref), so the regex split runs once per row."""
    df1 = df.selectExpr(*keep, f"{tokens(text_col, SPARK)} AS __toks")
    df2 = df1.selectExpr(
        *keep, f"{shingles_from_tokens('__toks', SPARK)} AS __shingles"
    )
    return df2.selectExpr(*keep, f"{hash_array('__shingles', SPARK)} AS __sh")


def stage_spark_token_hashes(df, text_col: str, keep: list[str]):
    """Spark: stage text -> __toks -> __th (token-hash array)."""
    df1 = df.selectExpr(*keep, f"{tokens(text_col, SPARK)} AS __toks")
    return df1.selectExpr(*keep, f"{hash_array('__toks', SPARK)} AS __th")


def duck_shingle_hash_cte(
    table: str, text_col: str, keep: list[str], cte_name: str = "h"
) -> str:
    """DuckDB: CTE chain staging tokens -> shingles -> hash array,
    ending in ``{cte_name}(keep..., sh)``."""
    cols = ", ".join(keep)
    return (
        f"__t AS (SELECT {cols}, {tokens(text_col, DUCK)} AS tk FROM {table}), "
        f"__s AS (SELECT {cols}, {shingles_from_tokens('tk', DUCK)} AS sg FROM __t), "
        f"{cte_name} AS (SELECT {cols}, {hash_array('sg', DUCK)} AS sh FROM __s)"
    )


def duck_token_hash_cte(
    table: str, text_col: str, keep: list[str], cte_name: str = "th"
) -> str:
    cols = ", ".join(keep)
    return (
        f"__t AS (SELECT {cols}, {tokens(text_col, DUCK)} AS tk FROM {table}), "
        f"{cte_name} AS (SELECT {cols}, {hash_array('tk', DUCK)} AS h FROM __t)"
    )

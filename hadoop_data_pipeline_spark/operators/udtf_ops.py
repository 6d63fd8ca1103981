"""Python UDTF surface (SURVEY.md §2.11).

The reference registers no UDF/UDTF of its own (`SURVEY.md §2.11`);
this module completes OUR engine's user-extension surface with a
Spark 4 Python user-defined TABLE function — the one UDF shape the
catalog did not yet demonstrate (scalar pandas UDFs, grouped
applyInPandas, mapInPandas, and applyInPandasWithState all exist
elsewhere).

Positioning, stated plainly: a Python UDTF is the SLOW path. The
production chunker is ``operators/curation.py:chunk_docs`` — a pure
JVM explode that whole-stage-codegens and never leaves Tungsten. The
UDTF below implements the IDENTICAL semantics so the equivalence test
(`tests/test_udtf.py`) can pin that the extension point produces
byte-identical rows to the built-in path; a user with genuinely
non-SQL row-expansion logic (a tokenizer DLL, a parser) plugs in here
and inherits the same lateral-join plan shape.

Scale shape: a UDTF lateral join is a per-partition Python subprocess
pipe — no shuffle is introduced; output size is corpus_tokens/stride
rows exactly like the JVM chunker. Arrow serialization is enabled
when the runtime supports it (``useArrow``), falling back silently to
pickle batches otherwise.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql.functions import udtf

#: Must mirror operators/curation.py chunk_docs defaults.
CHUNK_LEN = 32
STRIDE = 24


class _ChunkDocs:
    """Yield (doc_id, chunk_id, n_chunk_tokens, chunk_md5) rows —
    the exact row contract of ``curation.chunk_docs`` (chunk i covers
    0-based tokens [i*stride, min(i*stride+chunk_len, n)-1]; the last
    chunk runs short; a short document yields one chunk)."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        # mirror the JVM EXACTLY: Spark's trim() strips 0x20 spaces
        # only, and Java's \s is the ASCII class [ \t\n\x0B\f\r] —
        # Python's str-mode \s also matches Unicode whitespace
        # (U+00A0, ...), which would tokenize differently and break
        # the byte-identical equivalence this module promises.
        toks = re.split(r"[ \t\n\x0B\f\r]+", text.strip(" "))
        n = len(toks)
        n_chunks = 1 + max(0, (max(n - CHUNK_LEN, 0) + STRIDE - 1) // STRIDE)
        for i in range(n_chunks):
            lo = i * STRIDE
            hi = min(lo + CHUNK_LEN, n)
            chunk = toks[lo:hi]
            yield (
                doc_id,
                i,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest(),
            )


_RETURN_TYPE = (
    "doc_id bigint, chunk_id bigint, n_chunk_tokens bigint, "
    "chunk_md5 string"
)

try:  # Arrow-batched UDTF when the runtime supports the flag
    chunk_docs_udtf = udtf(_ChunkDocs, returnType=_RETURN_TYPE, useArrow=True)
except TypeError:  # pragma: no cover - older runtime without useArrow
    chunk_docs_udtf = udtf(_ChunkDocs, returnType=_RETURN_TYPE)


def register_udtfs(spark) -> None:
    """Register the module's UDTFs on ``spark`` for SQL lateral use:
    ``SELECT c.* FROM documents d, LATERAL chunk_docs_udtf(d.doc_id,
    d.text) c``."""
    spark.udtf.register("chunk_docs_udtf", chunk_docs_udtf)

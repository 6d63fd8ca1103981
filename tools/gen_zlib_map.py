"""Generate the pinned zlib-length map for the compression oracle.

Computes ``len(zlib.compress(text, 6))`` for every DISTINCT document
text across the shipped fixtures, keyed by md5(text), and writes it to
``hadoop_data_pipeline_spark/functions/zlib_lens.py`` — the same
versioned-derived-artifact shape as ``functions/ivf_centroids.py``.
Pinning moves the fixture I/O + ~6000 zlib compressions out of
``import queries_catalog`` (measured ~1.6 s per process) into this
one-time build step; a freshness pytest re-derives the map and fails
if the fixtures or the pinned zlib level drift.

Run from the repo root whenever the fixtures change::

    python tools/gen_zlib_map.py
"""

from __future__ import annotations

import hashlib
import os
import zlib

import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_data_pipeline_spark",
    "functions",
    "zlib_lens.py",
)

HEADER = '''"""Pinned zlib-6 compressed lengths per DISTINCT fixture document
text, keyed by md5(text) (GENERATED — do not edit; regenerate with
``python tools/gen_zlib_map.py``).

Content-addressed ground truth for the ``compression_ratio_quality``
DuckDB oracle: DuckDB has no zlib, so the oracle joins the documents
view to this map. Keying by text hash makes the same map correct at
every scale factor AND under the key-shifted stress corpora (doc_ids
change, texts don't); an inner join turns any unmapped text into a
row-count mismatch instead of a silent pass.
"""

ZLIB_LEVEL = {level}

#: md5(text-utf8) hex -> len(zlib.compress(text-utf8, ZLIB_LEVEL))
ZLIB_LENS: dict[str, int] = {{
'''


def build_map() -> dict[str, int]:
    rows: dict[str, int] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        col = pq.read_table(p, columns=["text"]).column("text").to_pylist()
        for t in col:
            if t is None:
                continue
            b = t.encode("utf-8")
            h = hashlib.md5(b).hexdigest()
            if h not in rows:
                rows[h] = len(zlib.compress(b, 6))
    return rows


def main() -> None:
    rows = build_map()
    assert rows, "no fixture documents found"
    with open(OUT, "w") as f:
        f.write(HEADER.format(level=6))
        for h, n in sorted(rows.items()):
            f.write(f'    "{h}": {n},\n')
        f.write("}\n")
    print(f"wrote {len(rows)} entries to {OUT}")


if __name__ == "__main__":
    main()

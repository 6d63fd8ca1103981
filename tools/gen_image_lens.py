"""Generate the pinned image-kernel ground-truth map.

For every DISTINCT document text across the shipped fixtures, renders
the deterministic PPM payload (``imagecodec.render_histogram_image``),
then computes — in plain numpy, without Spark execution (the map
shares the imagecodec module with the Spark kernels: it guards
against Spark-side plumbing drift, while ALGORITHMIC correctness is
pinned independently by hand-computed values in
tests/test_imagecodec.py) — the values the image
catalog entries' DuckDB oracles need:

* ``dhash``  — signed 64-bit difference hash of the decoded image
* ``px_sum`` / ``px_sumsq`` — exact integer pixel sum / sum-of-squares
  (the oracle derives mean/std with the same single float ops the
  Spark kernel uses)
* ``rz_md5`` — md5 hex of the max_side=16 ``resize_netpbm`` payload

Keyed by md5(text) — content-addressed, so one map is correct at
every scale factor and under the key-shifted stress corpora (the
``zlib_lens`` precedent). ``tools/artifact_gate.py`` re-derives a
sample per gate run and fails on drift.

Run from the repo root whenever the fixtures or the render/codec
change::

    python tools/gen_image_lens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_pipeline_spark.operators import imagecodec as ic  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_data_pipeline_spark",
    "functions",
    "image_lens.py",
)

HEADER = '''"""Pinned image-kernel ground truth per DISTINCT fixture document
text, keyed by md5(text) (GENERATED — do not edit; regenerate with
``python tools/gen_image_lens.py``).

Content-addressed oracle constants for the image catalog entries:
DuckDB cannot decode netpbm payloads, so the oracles join the
documents view to this map of Spark-independent (plain numpy, no
Spark execution — but SHARING the imagecodec kernels, so algorithmic
correctness is pinned separately by the hand-computed values in
tests/test_imagecodec.py) kernel outputs: signed-64 dHash, exact integer pixel
sum / sum-of-squares, and the md5 of the max_side=16 resized payload.
Keying by text hash keeps one map valid at every scale factor AND
under key-shifted stress corpora; inner joins turn any unmapped text
into a row-count mismatch instead of a silent pass.
"""

#: resize target pinned into ``rz_md5``.
RESIZE_MAX_SIDE = {max_side}

#: md5(text-utf8) hex -> (dhash signed-64, px_sum, px_sumsq, rz_md5)
IMAGE_LENS: dict[str, tuple[int, int, int, str]] = {{
'''

RESIZE_MAX_SIDE = 16


def lens_row(text: str) -> tuple[int, int, int, str]:
    """The per-text ground truth tuple (shared with the freshness
    gate in ``tools/artifact_gate.py``)."""
    payload = ic.render_histogram_image(text)
    arr, _fmt = ic.decode_netpbm(payload)
    stats = ic.image_pixel_stats(payload)
    rz, _w, _h = ic.resize_netpbm(payload, RESIZE_MAX_SIDE)
    return (
        ic.dhash64(arr),
        stats["px_sum"],
        stats["px_sumsq"],
        hashlib.md5(rz).hexdigest(),
    )


def build_map() -> dict[str, tuple[int, int, int, str]]:
    rows: dict[str, tuple[int, int, int, str]] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        col = pq.read_table(p, columns=["text"]).column("text").to_pylist()
        for t in col:
            if t is None:
                continue
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in rows:
                rows[h] = lens_row(t)
    return rows


def main() -> None:
    rows = build_map()
    assert rows, "no fixture documents found"
    with open(OUT, "w") as f:
        f.write(HEADER.format(max_side=RESIZE_MAX_SIDE))
        for h, (dh, s, ss, rz) in sorted(rows.items()):
            f.write(f'    "{h}": ({dh}, {s}, {ss}, "{rz}"),\n')
        f.write("}\n")
    print(f"wrote {len(rows)} entries to {OUT}")


if __name__ == "__main__":
    main()

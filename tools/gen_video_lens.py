"""Generate the pinned video-kernel ground-truth map.

For every DISTINCT document text across the shipped fixtures, renders
the deterministic uncompressed AVI
(``videocodec.render_scene_video``), then computes — in plain numpy,
without Spark execution (the map shares the videocodec/imagecodec
modules with the Spark kernels: it guards against Spark-side plumbing
drift, while ALGORITHMIC correctness is pinned independently by
hand-computed values in tests/test_videocodec.py) — the values the
video catalog entries' DuckDB oracles need:

* ``dh0..dh3`` — signed 64-bit per-frame difference hashes
* ``px_sum`` / ``px_sumsq`` — exact integer pixel sum /
  sum-of-squares across all frames
* ``dec_md5`` — md5 hex of the keep-every-2 ``decimate_avi`` payload
  (r14: pins the video transform stage byte-exactly)

Keyed by md5(text) — content-addressed (the ``image_lens`` /
``audio_lens`` precedent); ``tools/artifact_gate.py`` re-derives a
sample per gate run and fails on drift. Run from the repo root
whenever the fixtures or the render/codec change::

    python tools/gen_video_lens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_pipeline_spark.operators import videocodec as vc  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_data_pipeline_spark",
    "functions",
    "video_lens.py",
)

HEADER = '''"""Pinned video-kernel ground truth per DISTINCT fixture document
text, keyed by md5(text) (GENERATED — do not edit; regenerate with
``python tools/gen_video_lens.py``).

Content-addressed oracle constants for the video catalog entries:
DuckDB cannot decode AVI payloads, so the oracles join the documents
view to this map of Spark-independent (plain numpy, no Spark
execution — but SHARING the videocodec kernels, so algorithmic
correctness is pinned separately by the hand-computed values in
tests/test_videocodec.py) kernel outputs: four signed-64 per-frame
dHashes, the exact integer pixel sum / sum-of-squares across all
frames, and the md5 of the keep-every-2 decimated payload. Inner
joins turn any unmapped text into a row-count mismatch instead of a
silent pass.
"""

#: decimation stride pinned into ``dec_md5``.
DECIMATE_KEEP_EVERY = {keep}

#: render constants pinned with the values.
RENDER_FRAMES = {n_frames}
RENDER_US_PER_FRAME = {us_per_frame}
RENDER_W = {w}
RENDER_H = {h}

#: md5(text-utf8) hex -> (dh0, dh1, dh2, dh3, px_sum, px_sumsq,
#: dec_md5)
VIDEO_LENS: dict[str, tuple[int, int, int, int, int, int, str]] = {{
'''

DECIMATE_KEEP_EVERY = 2


def lens_row(text: str) -> tuple[int, int, int, int, int, int, str]:
    import hashlib as _h

    payload = vc.render_scene_video(text)
    st = vc.video_frame_stats(payload)
    dh = vc.frame_dhashes(payload)
    assert len(dh) == vc.RENDER_FRAMES
    dec, _n = vc.decimate_avi(payload, DECIMATE_KEEP_EVERY)
    return (*dh, st["px_sum"], st["px_sumsq"], _h.md5(dec).hexdigest())


def build_map() -> dict[str, tuple]:
    rows: dict[str, tuple] = {}
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
        f.write(
            HEADER.format(
                n_frames=vc.RENDER_FRAMES,
                us_per_frame=vc.RENDER_US_PER_FRAME,
                w=vc.RENDER_W,
                h=vc.RENDER_H,
                keep=DECIMATE_KEEP_EVERY,
            )
        )
        for h, vals in sorted(rows.items()):
            f.write(f'    "{h}": {vals!r},\n')
        f.write("}\n")
    print(f"wrote {len(rows)} entries to {OUT}")


if __name__ == "__main__":
    main()

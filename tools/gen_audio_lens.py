"""Generate the pinned audio-kernel ground-truth map.

For every DISTINCT document text across the shipped fixtures, renders
the deterministic PCM16 WAV (``audiocodec.render_tone_audio``), then
computes — in plain numpy, without Spark execution (the map shares
the audiocodec module with the Spark kernels: it guards against
Spark-side plumbing drift, while ALGORITHMIC correctness is pinned
independently by hand-computed values in tests/test_audiocodec.py)
— the values the audio catalog
entries' DuckDB oracles need:

* ``fp``      — signed 64-bit energy-difference fingerprint
* ``n``       — sample count (render-constant but pinned anyway)
* ``s_sum`` / ``s_sumsq`` — exact integer sample sum / sum-of-squares
* ``dec_md5`` — md5 hex of the factor-4 ``decimate_wav`` payload
  (r14: pins the audio transform stage byte-exactly)

Keyed by md5(text) — content-addressed (the ``image_lens``
precedent); ``tools/artifact_gate.py`` re-derives a sample per gate
run and fails on drift. Run from the repo root whenever the fixtures
or the render/codec change::

    python tools/gen_audio_lens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_pipeline_spark.operators import audiocodec as ac  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_data_pipeline_spark",
    "functions",
    "audio_lens.py",
)

HEADER = '''"""Pinned audio-kernel ground truth per DISTINCT fixture document
text, keyed by md5(text) (GENERATED — do not edit; regenerate with
``python tools/gen_audio_lens.py``).

Content-addressed oracle constants for the audio catalog entries:
DuckDB cannot decode WAV payloads, so the oracles join the documents
view to this map of Spark-independent (plain numpy, no Spark
execution — but SHARING the audiocodec kernels, so algorithmic
correctness is pinned separately by the hand-computed values in
tests/test_audiocodec.py) kernel outputs: signed-64 energy-difference
fingerprint, exact integer sample sum / sum-of-squares, and the md5
of the factor-4 decimated payload. Inner joins turn any unmapped
text into a row-count mismatch instead of a silent pass.
"""

#: decimation factor pinned into ``dec_md5``.
DECIMATE_FACTOR = {factor}

#: render constants pinned with the values.
RENDER_RATE = {rate}
RENDER_SAMPLES = {n}

#: md5(text-utf8) hex -> (fingerprint signed-64, s_sum, s_sumsq,
#: dec_md5)
AUDIO_LENS: dict[str, tuple[int, int, int, str]] = {{
'''

DECIMATE_FACTOR = 4


def lens_row(text: str) -> tuple[int, int, int, str]:
    import hashlib as _h

    payload = ac.render_tone_audio(text)
    st = ac.audio_sample_stats(payload)
    dec, _n = ac.decimate_wav(payload, DECIMATE_FACTOR)
    return (
        ac.audio_fingerprint64(payload),
        st["s_sum"],
        st["s_sumsq"],
        _h.md5(dec).hexdigest(),
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
        f.write(
            HEADER.format(
                rate=ac.RENDER_RATE, n=ac.RENDER_SAMPLES,
                factor=DECIMATE_FACTOR,
            )
        )
        for h, (fp, s, ss, dm) in sorted(rows.items()):
            f.write(f'    "{h}": ({fp}, {s}, {ss}, "{dm}"),\n')
        f.write("}\n")
    print(f"wrote {len(rows)} entries to {OUT}")


if __name__ == "__main__":
    main()

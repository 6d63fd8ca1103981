"""Pure-python WAV codec + audio kernel tests — all UN-SKIPPED (no
librosa/ffmpeg required), the audio twin of tests/test_imagecodec.py.
Algorithmic pins are hand-computed values; the distributed pins run
the production mapInPandas kernels over mixed good/corrupt frames."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from hadoop_data_pipeline_spark.operators import audiocodec as ac
from hadoop_data_pipeline_spark.operators import multimodal as mm

# ---------------------------------------------------------------------------
# codec: encode / decode
# ---------------------------------------------------------------------------


def test_wav_roundtrip():
    s = (np.arange(777) % 3001 - 1500).astype(np.int16)
    d, rate = ac.decode_wav(ac.encode_wav(s, 16000))
    assert rate == 16000 and (d == s).all()


def test_wav_tolerates_extra_riff_chunks():
    s = np.array([1, -2, 3, -4], dtype=np.int16)
    raw = ac.encode_wav(s, 8000)
    with_list = raw[:12] + b"LIST\x04\x00\x00\x00INFO" + raw[12:]
    with_list = (
        b"RIFF" + struct.pack("<I", len(with_list) - 8) + with_list[8:]
    )
    d, _ = ac.decode_wav(with_list)
    assert (d == s).all()


@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks
        b"OggS....",  # wrong container
        # stereo is not pure-python decodable here
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 40, b"WAVE", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16,
            b"data", 4,
        ) + b"\x00" * 4,
        # truncated data chunk
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 40, b"WAVE", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16,
            b"data", 8,
        ) + b"\x00" * 4,
    ],
)
def test_wav_rejects_malformed(raw):
    with pytest.raises(ValueError):
        ac.decode_wav(raw)


def test_decimate_wav():
    s = np.arange(0, 100, dtype=np.int16)
    out, n = ac.decimate_wav(ac.encode_wav(s, 8000), 4)
    d, rate = ac.decode_wav(out)
    assert n == 25 and rate == 2000 and (d == s[::4]).all()
    # factor 1 is identity on the samples
    out1, n1 = ac.decimate_wav(ac.encode_wav(s, 8000), 1)
    assert n1 == 100 and (ac.decode_wav(out1)[0] == s).all()
    with pytest.raises(ValueError):
        ac.decimate_wav(ac.encode_wav(s, 8000), 0)


# ---------------------------------------------------------------------------
# kernels: stats / fingerprint / render
# ---------------------------------------------------------------------------


def test_audio_sample_stats_exact_integers():
    s = np.array([3, -4, 5, 0], dtype=np.int16)
    st = ac.audio_sample_stats(ac.encode_wav(s, 8000))
    assert st["n_samples"] == 4 and st["rate"] == 8000
    assert st["duration_us"] == 4 * 1_000_000 // 8000
    assert st["s_sum"] == 4 and st["s_sumsq"] == 9 + 16 + 25


def test_fingerprint_energy_gradients_and_sign():
    # monotonically RISING frame energies -> no bit set (never >)
    n = ac.FP_FRAMES * 4
    rising = np.repeat(
        np.arange(ac.FP_FRAMES, dtype=np.int16) * 100, 4
    )
    assert ac.audio_fingerprint64(ac.encode_wav(rising)) == 0
    # monotonically FALLING -> every bit set -> signed -1
    assert ac.audio_fingerprint64(ac.encode_wav(rising[::-1].copy())) == -1
    # one spiked frame flips a bounded number of bits (2: up then down)
    spike = rising.copy()
    spike[8:12] = 30000  # frame 2 spikes
    h = ac.audio_fingerprint64(ac.encode_wav(spike))
    assert bin(h & ((1 << 64) - 1)).count("1") <= 2
    # clips shorter than the frame count still fingerprint (zero-pad)
    tiny = ac.audio_fingerprint64(ac.encode_wav(np.array([5], np.int16)))
    assert -(1 << 63) <= tiny < (1 << 63)


def test_render_tone_is_deterministic_and_content_addressed():
    a = ac.render_tone_audio("key agg row scan")
    b = ac.render_tone_audio("key agg row scan")
    c = ac.render_tone_audio("key agg row sort")
    assert a == b and a != c
    samples, rate = ac.decode_wav(a)
    assert rate == ac.RENDER_RATE and samples.size == ac.RENDER_SAMPLES
    # pure integer square waves: amplitudes are exact multiples of 400
    # until the int16 clip
    assert set(np.unique(np.abs(samples)) % 400) <= {0, 32768 % 400}


# ---------------------------------------------------------------------------
# distributed kernels (production mapInPandas path)
# ---------------------------------------------------------------------------


def test_decode_audio_unskipped(spark):
    s = np.array([100, -200, 300, -400], dtype=np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(ac.encode_wav(s, 8000))),
            (2, bytearray(b"not audio")),
        ],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in mm.decode_audio(df).collect()}
    ok = rows[1]
    assert (ok.n_samples, ok.rate) == (4, 8000)
    assert ok.amp_mean == (100 - 200 + 300 - 400) / 4
    ss = 100**2 + 200**2 + 300**2 + 400**2
    assert ok.amp_rms == (ss / 4) ** 0.5
    assert ok.decode_error is None
    assert rows[2].decode_error is not None and rows[2].n_samples is None


def test_decode_audio_zero_sample_wav_is_full_error_row(spark):
    # r13 ADVICE: a structurally-valid WAV with an EMPTY data chunk
    # must produce the same error-row contract as a corrupt payload —
    # decode_error set, EVERY stats column NULL (no half-filled rows)
    empty = ac.encode_wav(np.array([], dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(empty))], "doc_id bigint, payload binary"
    )
    [row] = mm.decode_audio(df).collect()
    assert row.decode_error is not None and "0 samples" in row.decode_error
    assert row.n_samples is None and row.rate is None
    assert row.duration_us is None
    assert row.amp_mean is None and row.amp_rms is None


def test_encode_wav_rejects_unrepresentable_input():
    # r13 ADVICE: silent wrap/truncate corrupted payloads; now loud
    with pytest.raises(ValueError, match="int16 range"):
        ac.encode_wav(np.array([40000], dtype=np.int32))
    with pytest.raises(ValueError, match="int16 range"):
        ac.encode_wav(np.array([-32769], dtype=np.int64))
    with pytest.raises(ValueError, match="integer samples"):
        ac.encode_wav(np.array([0.5, 1.5]))
    # in-range non-int16 dtypes encode exactly (no behavior change)
    out, _ = ac.decode_wav(ac.encode_wav(np.array([-32768, 32767])))
    assert (out == np.array([-32768, 32767], dtype=np.int16)).all()


def test_decode_wav_rejects_zero_rate():
    raw = bytearray(ac.encode_wav(np.array([1, 2], dtype=np.int16), 8000))
    raw[24:28] = (0).to_bytes(4, "little")  # fmt chunk sample-rate field
    with pytest.raises(ValueError, match="sample rate"):
        ac.decode_wav(bytes(raw))


def test_attach_wav_payload_and_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, "key agg row"), (2, "key agg row"), (3, "sort merge join")],
        "doc_id long, text string",
    )
    sig = {
        r.doc_id: r.fingerprint
        for r in mm.audio_fingerprints(mm.attach_wav_payload(docs)).collect()
    }
    assert sig[1] == sig[2]  # content-addressed
    ref = ac.audio_fingerprint64(ac.render_tone_audio("key agg row"))
    assert sig[1] == ref
    bad = spark.createDataFrame(
        [(9, bytearray(b"zzz"))], "doc_id bigint, payload binary"
    )
    assert mm.audio_fingerprints(bad).collect()[0].fingerprint is None


def test_audio_near_dup_banding_is_lossless(spark):
    """Generic signature banding == quadratic scan over the sf0.001
    corpus fingerprints (the image test's law on the audio column)."""
    from hadoop_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sig = mm.audio_fingerprints(mm.attach_wav_payload(docs))
    rows = {r.doc_id: r.fingerprint for r in sig.collect()}
    brute = set()
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
            if d <= 2:
                brute.add((a, b, d))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.signature_near_dup_pairs(
            sig, "fingerprint", max_hamming=2
        ).collect()
    }
    assert got == brute


def test_pinned_audio_lens_artifact_fresh():
    """Freshness pin for functions/audio_lens.py (image_lens
    precedent); tools/artifact_gate.py runs the same check in-gate."""
    import pyarrow.parquet as pq

    from hadoop_data_pipeline_spark.functions.audio_lens import AUDIO_LENS
    from tools.gen_audio_lens import lens_row

    texts = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        col = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["text"]
        ).column("text").to_pylist()
        for t in col:
            texts[hashlib.md5(t.encode()).hexdigest()] = t
    assert set(texts) == set(AUDIO_LENS)
    keys = sorted(AUDIO_LENS)
    for k in keys[:: max(1, len(keys) // 64)]:
        assert lens_row(texts[k]) == AUDIO_LENS[k]

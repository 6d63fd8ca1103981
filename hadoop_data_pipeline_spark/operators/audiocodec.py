"""Pure-python WAV (RIFF/PCM16) codec + audio fingerprint kernels.

The audio twin of :mod:`imagecodec` (r13): the container has no
librosa/ffmpeg, but canonical WAV is a 44-byte RIFF header over raw
little-endian PCM — no codec library needed — so decode / decimate /
fingerprint run un-skipped everywhere, completing the multimodal
tiers (image = netpbm, audio = WAV, video = frame digests) with REAL
parsers instead of byte-stat stand-ins.

Every kernel is EXACT-integer until the final statistic (the module
family's standing recipe): sample sums and sums-of-squares accumulate
in Python ints, the deterministic fixture render uses integer square
waves (no trig, no floats anywhere in the signal path), and the
64-bit fingerprint is energy-difference coding over integer frame
energies — so a plain-numpy reference derivation reproduces results
bit-for-bit and the catalog entries carry exact content-addressed
DuckDB oracles (``functions/audio_lens.py``, the ``image_lens``
precedent).

Fingerprint reference (public): Haitsma & Kalker's audio fingerprint
(ISMIR 2002) codes SIGNS OF ENERGY DIFFERENCES between adjacent
bands/frames; this kernel is the single-band time-axis variant — one
bit per adjacent frame-energy pair, the same construction dHash
applies to pixel columns.

Scale notes: all kernels are per-row ``mapInPandas`` projections —
zero shuffle; near-dup pairing happens downstream on 2 ints per clip
(``multimodal.signature_near_dup_pairs``), never on samples.
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache

import numpy as np

#: Fixture render parameters.
RENDER_RATE = 8000
RENDER_SAMPLES = 4096
FP_FRAMES = 65  #: fingerprint frame count (64 adjacent-pair bits)


def encode_wav(samples: np.ndarray, rate: int = RENDER_RATE) -> bytes:
    """Encode mono int16 samples as a canonical 44-byte-header PCM
    WAV (RIFF little-endian, one ``fmt `` + one ``data`` chunk).

    Raises ``ValueError`` on non-integer dtypes or values outside the
    int16 range — a silent wrap/truncate here would produce a
    valid-looking but corrupted payload whose downstream stats and
    fingerprints no longer match the caller's samples (r13 ADVICE)."""
    s = np.asarray(samples)
    if not np.issubdtype(s.dtype, np.integer):
        raise ValueError(
            f"encode_wav needs integer samples, got dtype {s.dtype}"
        )
    if s.size and (int(s.min()) < -32768 or int(s.max()) > 32767):
        raise ValueError(
            "samples outside int16 range "
            f"[{int(s.min())}, {int(s.max())}]; clip before encoding"
        )
    s = s.astype("<i2")
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # PCM
        1,  # mono
        rate,
        rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(data),
    )
    return hdr + data


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM16 mono WAV bytes to ``(int16 samples, rate)``.

    Walks RIFF chunks (tolerating extra chunks like LIST/INFO between
    ``fmt `` and ``data``); raises ``ValueError`` for anything that is
    not mono 16-bit PCM — callers surface that as a ``decode_error``
    COLUMN (one corrupt clip must never kill a stage)."""
    raw = bytes(raw)
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV layout (fmt={audio_fmt}, ch={channels}, "
            f"bits={bits}); only PCM16 mono is pure-python decodable here"
        )
    if rate <= 0:
        raise ValueError(f"non-positive WAV sample rate {rate}")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return np.frombuffer(data, dtype="<i2"), rate


def decimate_wav(raw: bytes, factor: int) -> tuple[bytes, int]:
    """Integer decimation: keep every ``factor``-th sample (the exact,
    deterministic downsample — a production resampler would low-pass
    first; this kernel is the bandwidth-reduction plumbing). Returns
    ``(payload, n_samples)``; re-encodes at ``rate // factor``."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    samples, rate = decode_wav(raw)
    out = samples[::factor]
    return encode_wav(out, max(1, rate // factor)), int(out.size)


def audio_sample_stats(raw: bytes) -> dict:
    """Exact-integer per-clip stats: sample count, rate, duration in
    whole microseconds, and the integer sum / sum-of-squares (floats
    are spent only on the final division — both engines compute
    identical doubles from the pinned integers)."""
    samples, rate = decode_wav(raw)
    s64 = samples.astype(np.int64)
    return {
        "n_samples": int(s64.size),
        "rate": int(rate),
        "duration_us": int(s64.size) * 1_000_000 // int(rate),
        "s_sum": int(s64.sum()),
        "s_sumsq": int((s64 * s64).sum()),
    }


def audio_fingerprint64(raw: bytes) -> int:
    """64-bit energy-difference fingerprint (Haitsma-Kalker shape) as
    SIGNED int64: the clip splits into ``FP_FRAMES`` equal frames
    (integer box partition, the dHash grid construction on the time
    axis), each frame's energy is the exact integer sum of squared
    samples, and bit i = energy(frame i) > energy(frame i+1) —
    MSB-first, two's complement, so it rides a Spark ``LongType`` /
    DuckDB ``BIGINT`` unchanged and ``bit_count(xor())`` is Hamming
    distance in both engines."""
    samples, _rate = decode_wav(raw)
    s64 = samples.astype(np.int64)
    n = s64.size
    if n < FP_FRAMES:  # pad the tail: short clips still fingerprint
        s64 = np.concatenate([s64, np.zeros(FP_FRAMES - n, dtype=np.int64)])
        n = s64.size
    edges = [i * n // FP_FRAMES for i in range(FP_FRAMES)]
    sq = s64 * s64
    energies = np.add.reduceat(sq, edges)
    bits = 0
    for i in range(FP_FRAMES - 1):
        bits = (bits << 1) | (1 if energies[i] > energies[i + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


# ---------------------------------------------------------------------------
# Deterministic fixture render: documents.text -> WAV payload.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1 << 20)
def _word_period(word: str, n_tones: int = 48) -> int:
    # md5-keyed square-wave half-period in samples (8..8+n_tones-1):
    # audible-band-ish at 8 kHz, and exactly reproducible.
    h = hashlib.md5(f"tone:{word}".encode("utf-8")).digest()
    return 8 + int.from_bytes(h[:8], "big") % n_tones


@lru_cache(maxsize=4096)
def _base_wave(period: int, n_samples: int) -> np.ndarray:
    """Unit (+-1) integer square wave — cached: the md5-keyed period
    space is tiny (48 values), so per-doc rendering reduces to
    count-scaled sums of cached bases instead of re-deriving each
    wave (measured 3.7 -> <1 s per catalog entry at sf0.1). The
    array is marked read-only so cache hits cannot be mutated."""
    t = np.arange(n_samples, dtype=np.int64)
    w = np.where((t // period) % 2 == 0, 1, -1).astype(np.int64)
    w.setflags(write=False)
    return w


def render_tone_audio(
    text: str, n_samples: int = RENDER_SAMPLES, rate: int = RENDER_RATE
) -> bytes:
    """Deterministic PCM16 render of a document: each distinct word
    contributes an integer SQUARE WAVE (+-amp, half-period md5-keyed
    per word, amplitude scaled by its count) and the mix saturates to
    int16. No floats anywhere, so the render is bit-exact on any
    platform. Documents with mostly-shared word multisets — the
    planted near-duplicate profile — mix mostly-shared tones, so
    their energy envelopes are close and the fingerprint recovers the
    near-dup pairs: the "same recording, light re-encode" regime the
    hash targets in production. Content-addressed: payload depends
    only on ``text``."""
    words = text.split()
    counts: dict[int, int] = {}
    for w in words:
        p = _word_period(w)
        counts[p] = counts.get(p, 0) + 1
    mix = np.zeros(n_samples, dtype=np.int64)
    for period, cnt in counts.items():
        amp = min(4000, 400 * cnt)
        # integer square wave: +amp when (t // period) is even
        mix += amp * _base_wave(period, n_samples)
    clipped = np.clip(mix, -32768, 32767).astype(np.int16)
    return encode_wav(clipped, rate)

"""Independent re-derivation of the media lens-map ground truth —
pure stdlib (hashlib + struct), NO numpy, NO import of the engine's
codec modules or the ``gen_*_lens`` generators.

Why this exists (r14 verdict next #5): the lens-map generators import
the same ``imagecodec`` / ``audiocodec`` / ``videocodec`` modules the
Spark kernels call, so a bug in a shared kernel would be
self-consistently pinned — generator and engine would agree on the
wrong value, and the drift gate would stay green. The hand-computed
pins in the codec test suites carry algorithmic independence but
cover few samples. This module is a SECOND, structurally different
derivation of the full text -> lens-row pipeline per tier:

* loops over ints and ``bytes`` where the codecs use numpy array ops
  (different arithmetic paths, different overflow surfaces);
* container writers built from the published formats (netpbm header
  grammar, canonical 44-byte PCM WAV, RIFF/AVI with 'vids'/'DIB '
  stream headers and an idx1 index) via a generic chunk assembler,
  not a transcription of the codec's struct calls;
* no shared helpers at all — even md5 cell/tone keying is re-stated
  from the documented fixture contract (seeded ``md5(f"{seed}:{word}")``
  scatter, ``md5(f"tone:{word}")`` period).

``tools/artifact_gate.py`` re-derives a seeded random sample per tier
through this module every gate run and compares against the pinned
maps; agreement means a shared-kernel bug cannot hide — it would have
to be implemented twice, differently, by accident.

Fixture contracts re-stated here (the constants both derivations pin):
image 32x32 RGB PPM, step 24, resize max-side 16; audio PCM16 mono,
4096 samples @ 8 kHz, 65 fingerprint frames, decimate factor 4;
video 4 frames @ 40,000 us, channel seeds 3k+c, decimate keep-every 2.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# shared integer helpers (stdlib-only)
# ---------------------------------------------------------------------------


def _signed64(bits: int) -> int:
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _box_means(flat: list[int], h: int, w: int,
               out_h: int, out_w: int) -> list[list[int]]:
    """Exact floor-mean over the box partition [r*h//out_h, ...) x
    [c*w//out_w, ...) of a row-major flat channel — per-cell Python
    loops (the codec uses ``np.add.reduceat``)."""
    grid = []
    for r in range(out_h):
        r0, r1 = r * h // out_h, (r + 1) * h // out_h
        row = []
        for c in range(out_w):
            c0, c1 = c * w // out_w, (c + 1) * w // out_w
            s = 0
            for y in range(r0, r1):
                base = y * w
                for x in range(c0, c1):
                    s += flat[base + x]
            row.append(s // ((r1 - r0) * (c1 - c0)))
        grid.append(row)
    return grid


def _dhash_rgb(pix: list[tuple[int, int, int]], h: int, w: int) -> int:
    """64-bit dHash of a row-major RGB pixel list: ITU-R 601 integer
    luma, 8x9 box-mean grid, bit = left > right, row-major MSB-first,
    two's-complement signed."""
    lum = [(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in pix]
    grid = _box_means(lum, h, w, 8, 9)
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
    return _signed64(bits)


# ---------------------------------------------------------------------------
# image tier: text -> (dhash, px_sum, px_sumsq, resize_md5)
# ---------------------------------------------------------------------------

_IMG_W = _IMG_H = 32
_IMG_STEP = 24
_RESIZE_MAX = 16


def _scatter_channel(word_counts: dict[str, int], seed: int,
                     w: int, h: int, step: int) -> list[int]:
    """One channel of the documented fixture render: md5-seeded
    word-count scatter, intensity min(255, step * count)."""
    cells: dict[int, int] = {}
    n_cells = w * h
    for word, cnt in word_counts.items():
        key = hashlib.md5(f"{seed}:{word}".encode("utf-8")).digest()
        cell = int.from_bytes(key[:8], "big") % n_cells
        cells[cell] = cells.get(cell, 0) + cnt
    chan = [0] * n_cells
    for cell, n in cells.items():
        chan[cell] = min(255, step * n)
    return chan


def _word_counts(text: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for word in text.split():
        counts[word] = counts.get(word, 0) + 1
    return counts


def _render_rgb(text: str, seeds: tuple[int, int, int],
                w: int = _IMG_W, h: int = _IMG_H) -> list[tuple[int, int, int]]:
    wc = _word_counts(text)
    chans = [_scatter_channel(wc, s, w, h, _IMG_STEP) for s in seeds]
    return list(zip(*chans))


def _ppm_bytes(pix: list[tuple[int, int, int]], w: int, h: int) -> bytes:
    body = bytes(v for px in pix for v in px)
    return b"P6" + f"\n{w} {h}\n255\n".encode("ascii") + body


def image_row(text: str) -> tuple[int, int, int, str]:
    pix = _render_rgb(text, (0, 1, 2))
    s = sum(v for px in pix for v in px)
    ss = sum(v * v for px in pix for v in px)
    dh = _dhash_rgb(pix, _IMG_H, _IMG_W)
    # resize: longer edge 32 -> 16, aspect preserved, per-channel
    # exact box floor-mean, re-encoded P6
    small: list[tuple[int, int, int]] = []
    grids = [
        _box_means([px[c] for px in pix], _IMG_H, _IMG_W,
                   _RESIZE_MAX, _RESIZE_MAX)
        for c in range(3)
    ]
    for r in range(_RESIZE_MAX):
        for c in range(_RESIZE_MAX):
            small.append((grids[0][r][c], grids[1][r][c], grids[2][r][c]))
    rz = hashlib.md5(
        _ppm_bytes(small, _RESIZE_MAX, _RESIZE_MAX)
    ).hexdigest()
    return dh, s, ss, rz


# ---------------------------------------------------------------------------
# audio tier: text -> (fingerprint, s_sum, s_sumsq, decimate_md5)
# ---------------------------------------------------------------------------

_AUD_N = 4096
_AUD_RATE = 8000
_FP_FRAMES = 65
_AUD_DECIMATE = 4


def _render_samples(text: str) -> list[int]:
    """Documented square-wave mix: per distinct word, half-period
    8 + md5('tone:'+word) % 48, amplitude min(4000, 400*count); the
    mix clips to int16."""
    periods: dict[int, int] = {}
    for word, cnt in _word_counts(text).items():
        key = hashlib.md5(f"tone:{word}".encode("utf-8")).digest()
        p = 8 + int.from_bytes(key[:8], "big") % 48
        periods[p] = periods.get(p, 0) + cnt
    out = []
    for t in range(_AUD_N):
        v = 0
        for p, cnt in periods.items():
            amp = min(4000, 400 * cnt)
            v += amp if (t // p) % 2 == 0 else -amp
        out.append(max(-32768, min(32767, v)))
    return out


def _wav_bytes(samples: list[int], rate: int) -> bytes:
    data = b"".join(struct.pack("<h", v) for v in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def audio_row(text: str) -> tuple[int, int, int, str]:
    s = _render_samples(text)
    s_sum = sum(s)
    s_sumsq = sum(v * v for v in s)
    # 65-frame energy-difference fingerprint
    n = len(s)
    edges = [i * n // _FP_FRAMES for i in range(_FP_FRAMES)] + [n]
    energies = [
        sum(v * v for v in s[edges[i]:edges[i + 1]])
        for i in range(_FP_FRAMES)
    ]
    bits = 0
    for i in range(_FP_FRAMES - 1):
        bits = (bits << 1) | (1 if energies[i] > energies[i + 1] else 0)
    fp = _signed64(bits)
    dec = _wav_bytes(s[::_AUD_DECIMATE], _AUD_RATE // _AUD_DECIMATE)
    return fp, s_sum, s_sumsq, hashlib.md5(dec).hexdigest()


# ---------------------------------------------------------------------------
# video tier: text -> (d0, d1, d2, d3, px_sum, px_sumsq, decimate_md5)
# ---------------------------------------------------------------------------

_VID_FRAMES = 4
_VID_US = 40_000
_VID_KEEP = 2


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _dib(pix: list[tuple[int, int, int]], w: int, h: int) -> bytes:
    """24-bpp DIB: BGR, rows bottom-up, stride padded to 4 bytes."""
    stride = (3 * w + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray(stride)
        for x in range(w):
            r, g, b = pix[y * w + x]
            row[3 * x:3 * x + 3] = bytes((b, g, r))
        rows.append(bytes(row))
    return b"".join(rows)


def _avi_bytes(frames: list[list[tuple[int, int, int]]],
               w: int, h: int, us_per_frame: int) -> bytes:
    n = len(frames)
    frame_bytes = ((3 * w + 3) & ~3) * h
    avih = _chunk(b"avih", struct.pack(
        "<14I", us_per_frame, 0, 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    ))
    strh = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIii4h",
        b"vids", b"DIB ", 0, 0, 0, 0,
        us_per_frame, 1_000_000, 0, n, frame_bytes, 0, 0,
        0, 0, w, h,
    ))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    ))
    hdrl = _chunk(b"LIST", b"hdrl" + avih
                  + _chunk(b"LIST", b"strl" + strh + strf))
    movi_body = b""
    offsets = []
    for f in frames:
        offsets.append(4 + len(movi_body))  # relative to 'movi' fourcc
        movi_body += _chunk(b"00db", _dib(f, w, h))
    movi = _chunk(b"LIST", b"movi" + movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes)
        for off in offsets
    ))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def video_row(text: str) -> tuple[int, int, int, int, int, int, str]:
    frames = [
        _render_rgb(text, (3 * k, 3 * k + 1, 3 * k + 2))
        for k in range(_VID_FRAMES)
    ]
    dhs = [_dhash_rgb(f, _IMG_H, _IMG_W) for f in frames]
    s = sum(v for f in frames for px in f for v in px)
    ss = sum(v * v for f in frames for px in f for v in px)
    dec = _avi_bytes(
        frames[::_VID_KEEP], _IMG_W, _IMG_H, _VID_US * _VID_KEEP
    )
    return (*dhs, s, ss, hashlib.md5(dec).hexdigest())

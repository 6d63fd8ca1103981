"""Property-based tests (hypothesis) for the pure-python codec tiers.

The example-based tests pin hand-computed values; these pin the
ALGEBRAIC invariants across the input space — the class of bug a
fixed example can miss (header edge cases, odd dimensions, extreme
amplitudes, single-pixel/single-sample payloads)."""

from __future__ import annotations

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from hadoop_data_pipeline_spark.operators import audiocodec as ac
from hadoop_data_pipeline_spark.operators import imagecodec as ic

# Keep cases small: the point is shape coverage, not volume.
SETTINGS = settings(max_examples=60, deadline=None)


@st.composite
def rgb_arrays(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    flat = draw(
        st.lists(st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3)
    )
    return np.array(flat, dtype=np.uint8).reshape(h, w, 3)


@st.composite
def gray_arrays(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    flat = draw(st.lists(st.integers(0, 255), min_size=h * w, max_size=h * w))
    return np.array(flat, dtype=np.uint8).reshape(h, w)


@SETTINGS
@given(rgb_arrays())
def test_ppm_roundtrip_any_dims(arr):
    out, fmt = ic.decode_netpbm(ic.encode_netpbm(arr))
    assert fmt == "PPM" and (out == arr).all()


@SETTINGS
@given(gray_arrays())
def test_pgm_roundtrip_any_dims(arr):
    out, fmt = ic.decode_netpbm(ic.encode_netpbm(arr))
    assert fmt == "PGM" and (out[:, :, 0] == arr).all()


@SETTINGS
@given(gray_arrays(), st.integers(1, 24), st.integers(1, 24))
def test_box_downsample_is_exact_floor_mean(arr, oh, ow):
    h, w = arr.shape
    oh, ow = min(oh, h), min(ow, w)
    got = ic.box_downsample(arr, oh, ow)
    # independent reference: explicit box loops
    a = arr.astype(np.int64)
    for r in range(oh):
        for c in range(ow):
            r0, r1 = r * h // oh, (r + 1) * h // oh
            c0, c1 = c * w // ow, (c + 1) * w // ow
            box = a[r0:r1, c0:c1]
            assert got[r, c] == int(box.sum()) // box.size
    # a mean can never leave the input's value range
    assert got.min() >= a.min() and got.max() <= a.max()


@SETTINGS
@given(rgb_arrays(), st.integers(1, 64))
def test_resize_never_upscales_and_roundtrips(arr, max_side):
    raw = ic.encode_netpbm(arr)
    out, w, h = ic.resize_netpbm(raw, max_side)
    assert max(w, h) <= max(max_side, max(arr.shape[0], arr.shape[1]))
    if max(arr.shape[0], arr.shape[1]) <= max_side:
        assert out == raw  # pass-through byte-identical
    else:
        assert max(w, h) == max_side and min(w, h) >= 1
    # output always decodes to the reported dims
    dec, _ = ic.decode_netpbm(out)
    assert dec.shape[:2] == (h, w)


@SETTINGS
@given(rgb_arrays())
def test_dhash_is_signed64_and_reencode_stable(arr):
    h = ic.dhash64(arr)
    assert -(1 << 63) <= h < (1 << 63)
    # decode(encode(x)) is x, so the hash must be re-encode stable
    again, _ = ic.decode_netpbm(ic.encode_netpbm(arr))
    assert ic.dhash64(again) == h


@st.composite
def pcm_arrays(draw):
    n = draw(st.integers(1, 2048))
    vals = draw(st.lists(st.integers(-32768, 32767), min_size=n, max_size=n))
    return np.array(vals, dtype=np.int16)


@SETTINGS
@given(pcm_arrays(), st.integers(1, 96000))
def test_wav_roundtrip_any_samples(samples, rate):
    out, got_rate = ac.decode_wav(ac.encode_wav(samples, rate))
    assert got_rate == rate and (out == samples).all()


@SETTINGS
@given(pcm_arrays(), st.integers(1, 16))
def test_decimate_is_stride_slice(samples, k):
    out, n = ac.decimate_wav(ac.encode_wav(samples, 8000), k)
    dec, _ = ac.decode_wav(out)
    assert n == len(samples[::k]) and (dec == samples[::k]).all()


@SETTINGS
@given(pcm_arrays())
def test_audio_stats_match_numpy_reference(samples):
    st_ = ac.audio_sample_stats(ac.encode_wav(samples, 8000))
    s64 = samples.astype(np.int64)
    assert st_["s_sum"] == int(s64.sum())
    assert st_["s_sumsq"] == int((s64 * s64).sum())
    assert st_["n_samples"] == samples.size


@SETTINGS
@given(pcm_arrays())
def test_fingerprint_is_signed64_and_deterministic(samples):
    raw = ac.encode_wav(samples, 8000)
    fp = ac.audio_fingerprint64(raw)
    assert -(1 << 63) <= fp < (1 << 63)
    assert fp == ac.audio_fingerprint64(raw)


@SETTINGS
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_renders_accept_any_ascii_text(text):
    # fixture generators must never crash on odd inputs (empty text,
    # punctuation-only, very long words)
    img, _ = ic.decode_netpbm(ic.render_histogram_image(text))
    assert img.shape == (ic.RENDER_H, ic.RENDER_W, 3)
    snd, rate = ac.decode_wav(ac.render_tone_audio(text))
    assert rate == ac.RENDER_RATE and snd.size == ac.RENDER_SAMPLES


# ---------------------------------------------------------------------------
# video tier (r14): AVI container + per-frame kernels
# ---------------------------------------------------------------------------

from hadoop_data_pipeline_spark.operators import videocodec as vc  # noqa: E402


@st.composite
def frame_stacks(draw):
    n = draw(st.integers(1, 4))
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    flat = draw(
        st.lists(
            st.integers(0, 255), min_size=n * h * w * 3, max_size=n * h * w * 3
        )
    )
    return np.array(flat, dtype=np.uint8).reshape(n, h, w, 3)


@SETTINGS
@given(frame_stacks(), st.integers(1, 10_000_000))
def test_avi_roundtrip_any_dims(frames, us):
    dec, got_us = vc.decode_avi(vc.encode_avi(frames, us))
    assert got_us == us and dec.shape == frames.shape
    assert (dec == frames).all()


@SETTINGS
@given(frame_stacks())
def test_video_stats_match_numpy_reference(frames):
    st_ = vc.video_frame_stats(vc.encode_avi(frames, 1000))
    flat = frames.astype(np.int64)
    assert st_["px_sum"] == int(flat.sum())
    assert st_["px_sumsq"] == int((flat * flat).sum())
    assert st_["n_frames"] == frames.shape[0]
    assert st_["duration_us"] == frames.shape[0] * 1000


@SETTINGS
@given(frame_stacks())
def test_frame_dhashes_agree_with_image_kernel(frames):
    # the video path must hash each frame EXACTLY as the image tier
    # would hash the same raster (incl. the sub-grid upscale rule the
    # r13 sweep fixed) — cross-tier drift here would silently split
    # the image/video near-dup semantics
    dh = vc.frame_dhashes(vc.encode_avi(frames, 1))
    assert dh == [ic.dhash64(frames[k]) for k in range(frames.shape[0])]


@SETTINGS
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_video_render_accepts_any_ascii_text(text):
    frames, us = vc.decode_avi(vc.render_scene_video(text))
    assert frames.shape == (vc.RENDER_FRAMES, vc.RENDER_H, vc.RENDER_W, 3)
    assert us == vc.RENDER_US_PER_FRAME
    # cross-tier pin holds for EVERY text, not just the examples
    img, _ = ic.decode_netpbm(ic.render_histogram_image(text))
    assert (frames[0] == img).all()


@SETTINGS
@given(frame_stacks(), st.integers(1, 6))
def test_decimate_avi_is_frame_stride_slice(frames, k):
    raw = vc.encode_avi(frames, 1000)
    dec, n = vc.decimate_avi(raw, k)
    out, us = vc.decode_avi(dec)
    assert n == len(frames[::k]) and (out == frames[::k]).all()
    assert us == 1000 * k  # wall duration preserved for every stride

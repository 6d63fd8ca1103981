"""Two-derivation agreement for the media lens ground truth: the
stdlib-only re-derivation (``tools/independent_lens.py`` — no numpy,
no codec modules) must equal the generator derivation (``tools/
gen_*_lens.py`` — the numpy codec path the Spark kernels share) on
arbitrary texts, not just the fixture corpus. This is the dev-time
face of the artifact gate's per-commit sampled check (r14 verdict
next #5): a shared-kernel bug now has to be implemented twice,
differently, by accident, before it can pin a wrong lens value."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import gen_audio_lens  # noqa: E402
import gen_image_lens  # noqa: E402
import gen_video_lens  # noqa: E402
import independent_lens as il  # noqa: E402

EDGE_TEXTS = [
    "",  # no words: all-zero raster / silent clip
    "word",  # single word
    "a a a a a a a a a a a a a a a",  # saturating count
    "the quick brown fox jumps over the lazy dog",
    "naïve café résumé 統一 текст",  # non-ascii md5 keying
    " \t leading and   irregular \n whitespace ",
]


@pytest.mark.parametrize("text", EDGE_TEXTS)
def test_image_rows_agree(text):
    assert il.image_row(text) == tuple(gen_image_lens.lens_row(text))


@pytest.mark.parametrize("text", EDGE_TEXTS)
def test_audio_rows_agree(text):
    assert il.audio_row(text) == tuple(gen_audio_lens.lens_row(text))


@pytest.mark.parametrize("text", EDGE_TEXTS)
def test_video_rows_agree(text):
    assert il.video_row(text) == tuple(gen_video_lens.lens_row(text))


# property sweep: random word multisets (the renders are functions of
# the word multiset, so this is the whole input space that matters).
# Video is the slowest row (~12 renders); keep the example budget
# modest — the artifact gate re-samples the real corpus every commit.
words = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Zs", "Cc")),
        min_size=1,
        max_size=8,
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=25, deadline=None)
@given(words)
def test_all_tiers_agree_on_random_multisets(ws):
    text = " ".join(ws)
    assert il.image_row(text) == tuple(gen_image_lens.lens_row(text))
    assert il.audio_row(text) == tuple(gen_audio_lens.lens_row(text))
    assert il.video_row(text) == tuple(gen_video_lens.lens_row(text))

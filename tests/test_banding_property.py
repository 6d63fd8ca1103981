"""Property-based tests (hypothesis) for the banding/dedup pair
generators — VERDICT r13 next #3.

The r13 codec property sweep found a real bug a fixed example missed
(sub-grid dHash); this suite applies the same technique to the pair
generators, whose correctness rests on a combinatorial claim (the
pigeonhole/subset-coverage lemma) that random corpora probe far
better than hand examples: Hamming boundary cases (exactly h vs
h+1), band-boundary bit positions, degenerate clusters (many
identical signatures), and every (n_bands, max_hamming) geometry.

Two layers:

* PURE lemmas (no Spark, hundreds of examples): subset-key coverage
  — any two signatures within Hamming h share at least one intact
  (n_bands - h)-subset key under the exact integer arithmetic the
  SQL expressions use — and its sharpness (h+1 flips CAN evade every
  subset when placed adversarially).
* SPARK laws (one shared session, few examples of small generated
  corpora): the banded plans' output EQUALS the brute-force scan —
  signature_near_dup_pairs, video_scene_near_dup_pairs, and
  _pairs_from_banded against set-logic references.
"""

from __future__ import annotations

import itertools

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from hadoop_data_pipeline_spark.operators import multimodal as mm

U64 = (1 << 64) - 1


def to_signed(x: int) -> int:
    x &= U64
    return x - (1 << 64) if x >= (1 << 63) else x


def subset_keys(sig: int, n_bands: int, max_hamming: int) -> set:
    """Python mirror of the SQL subset-key arithmetic in
    ``signature_near_dup_pairs``: arithmetic shift + band mask on the
    SIGNED value (python's ``>>`` is arithmetic too), concatenated by
    integer multiply — any mismatch with the SQL would show up in the
    Spark-vs-brute law below, but mirroring it here lets the pure
    lemma run at volume."""
    bpb = 64 // n_bands
    mask = (1 << bpb) - 1
    keys = set()
    for i, combo in enumerate(
        itertools.combinations(range(n_bands), n_bands - max_hamming)
    ):
        key = sum(
            ((sig >> (b * bpb)) & mask) * (1 << (pos * bpb))
            for pos, b in enumerate(combo)
        )
        keys.add((i, key))
    return keys


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & U64).count("1")


GEOMETRIES = [(4, 1), (4, 2), (4, 3), (8, 3), (8, 7), (2, 1), (16, 2)]

PURE = settings(max_examples=300, deadline=None)
SPARKY = settings(max_examples=10, deadline=None)


@PURE
@given(
    st.integers(-(1 << 63), (1 << 63) - 1),
    st.data(),
    st.sampled_from(GEOMETRIES),
)
def test_subset_coverage_lemma(sig, data, geom):
    """<= h flips leave at least one emitted subset key intact (the
    exactness half of the pigeonhole argument)."""
    n_bands, h = geom
    n_flips = data.draw(st.integers(0, h))
    flip_bits = data.draw(
        st.lists(
            st.integers(0, 63), min_size=n_flips, max_size=n_flips, unique=True
        )
    )
    other = sig
    for bit in flip_bits:
        other = to_signed(other ^ (1 << bit))
    assert hamming(sig, other) <= h
    assert subset_keys(sig, n_bands, h) & subset_keys(other, n_bands, h)


@PURE
@given(st.integers(-(1 << 63), (1 << 63) - 1), st.sampled_from(GEOMETRIES))
def test_subset_coverage_is_sharp(sig, geom):
    """h+1 flips placed in h+1 DISTINCT bands evade every
    (n_bands - h)-subset — the lemma is tight, so the in-bucket
    Hamming verification (not the banding) is what enforces the
    threshold."""
    n_bands, h = geom
    if h + 1 > n_bands:
        return
    bpb = 64 // n_bands
    other = sig
    for band in range(h + 1):  # one flip in each of h+1 bands
        other = to_signed(other ^ (1 << (band * bpb)))
    assert hamming(sig, other) == h + 1
    assert not (subset_keys(sig, n_bands, h) & subset_keys(other, n_bands, h))


@st.composite
def signature_corpora(draw):
    """Clustered corpora: a few centers, each item = a center with
    0..4 flipped bits (covers exact dups, within-threshold, boundary,
    and over-threshold pairs); plus band-boundary flips (bits 15/16,
    31/32, 47/48) drawn often to probe the key-split edges."""
    n_centers = draw(st.integers(1, 4))
    centers = draw(
        st.lists(
            st.integers(-(1 << 63), (1 << 63) - 1),
            min_size=n_centers,
            max_size=n_centers,
            unique=True,
        )
    )
    n_items = draw(st.integers(2, 40))
    edge_bits = [0, 15, 16, 31, 32, 47, 48, 63]
    items = []
    for i in range(n_items):
        c = draw(st.integers(0, n_centers - 1))
        n_flips = draw(st.integers(0, 4))
        bits = draw(
            st.lists(
                st.sampled_from(edge_bits + list(range(64))),
                min_size=n_flips,
                max_size=n_flips,
                unique=True,
            )
        )
        sig = centers[c]
        for b in bits:
            sig = to_signed(sig ^ (1 << b))
        items.append((i, sig))
    return items


@SPARKY
@given(signature_corpora(), st.sampled_from([(4, 1), (4, 2), (4, 3), (8, 3)]))
def test_signature_near_dup_pairs_equals_brute(spark, corpus, geom):
    n_bands, h = geom
    df = spark.createDataFrame(corpus, "doc_id long, dhash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.signature_near_dup_pairs(
            df, "dhash", max_hamming=h, n_bands=n_bands
        ).collect()
    }
    brute = {
        (a, b, hamming(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(corpus, 2)
        if hamming(sa, sb) <= h
    }
    assert got == brute


@st.composite
def frame_corpora(draw):
    """Per-frame signature corpora for the shared-scene law: videos
    with 1..4 frames (ragged allowed — decode failures drop frames),
    clustered as above."""
    base = draw(signature_corpora())
    rows = []
    for doc_id, sig in base:
        n_frames = draw(st.integers(1, 4))
        for k in range(n_frames):
            # frame k perturbs the doc signature by 0..2 bits
            n_flips = draw(st.integers(0, 2))
            bits = draw(
                st.lists(
                    st.integers(0, 63),
                    min_size=n_flips,
                    max_size=n_flips,
                    unique=True,
                )
            )
            s = sig
            for b in bits:
                s = to_signed(s ^ (1 << b))
            rows.append((doc_id, k, s))
    return rows


@SPARKY
@given(frame_corpora(), st.integers(1, 3), st.integers(1, 4))
def test_video_scene_near_dup_equals_brute(spark, rows, h, min_shared):
    df = spark.createDataFrame(rows, "doc_id long, frame_idx int, dhash long")
    got = {
        (r.id_a, r.id_b, r.shared_frames)
        for r in mm.video_scene_near_dup_pairs(
            df, max_hamming=h, n_bands=4, min_shared_frames=min_shared
        ).collect()
    }
    per_doc: dict[int, dict[int, int]] = {}
    for d, k, s in rows:
        per_doc.setdefault(d, {})[k] = s
    brute = set()
    for a, b in itertools.combinations(sorted(per_doc), 2):
        shared = sum(
            1
            for k in per_doc[a]
            if k in per_doc[b] and hamming(per_doc[a][k], per_doc[b][k]) <= h
        )
        if shared >= min_shared:
            brute.add((a, b, shared))
    assert got == brute


@st.composite
def banded_rows(draw):
    """(id, band_id, band_key) rows with heavy key collisions — the
    _pairs_from_banded bucket-expansion input shape."""
    n_ids = draw(st.integers(2, 30))
    rows = []
    for i in range(n_ids):
        for band in range(draw(st.integers(1, 4))):
            key = draw(st.sampled_from(["k0", "k1", "k2", "k3", "k4"]))
            rows.append((i, band, key))
    return rows


@SPARKY
@given(banded_rows())
def test_pairs_from_banded_equals_set_logic(spark, rows):
    from hadoop_data_pipeline_spark.operators.dedup import _pairs_from_banded

    df = spark.createDataFrame(
        rows, "doc_id long, band_id int, band_key string"
    ).distinct()
    got = {
        (r.id_a, r.id_b) for r in _pairs_from_banded(df, "doc_id").collect()
    }
    buckets: dict[tuple, set] = {}
    for i, band, key in rows:
        buckets.setdefault((band, key), set()).add(i)
    brute = {
        (a, b)
        for ids in buckets.values()
        for a, b in itertools.combinations(sorted(ids), 2)
    }
    assert got == brute

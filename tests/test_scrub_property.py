"""Property-based checks of the two most intricate distributed
kernels against brute-force in-memory references:

* :func:`dedup.remove_shared_substrings` (Lee et al. exact-substring
  scrub) — the digest-join + covered-position-set pipeline must equal
  a direct ``set``-of-tuples implementation for arbitrary small
  corpora. Hypothesis probes the shapes the fixtures don't: documents
  shorter than the window, fully-duplicated documents, windows shared
  at multiple positions WITHIN one doc (which must NOT count as
  shared — sharing is >= 2 DISTINCT documents), overlapping covered
  spans, empty corpora slices.
* :func:`dedup.connected_components` — BOTH execution strategies
  (driver union-find and distributed hash-min, forced via
  ``driver_edge_limit=0``) must equal a brute-force label propagation
  on arbitrary small graphs, including self-loops, duplicate edges,
  multi-component graphs, and isolated nodes.

A tiny vocabulary forces heavy window collisions, so every run
exercises real sharing, not near-misses.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_data_pipeline_spark.operators import dedup as dd

WINDOW = 3

# token lists over a 3-word vocab: length 0-10 keeps each example's
# Spark work trivial while making cross-doc window collisions common.
corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), max_size=10),
    min_size=1,
    max_size=6,
)


def _spark_tokens(text: str) -> list[str]:
    """Mirror dual.tokens: split(trim(x), '\\s+') — an empty/blank
    string yields [''], not [] (Spark's split never returns empty)."""
    return re.split(r"\s+", text.strip())


def _brute_scrub(texts: list[str], window: int) -> dict[int, tuple]:
    toks = {i: _spark_tokens(t) for i, t in enumerate(texts)}
    owners: dict[tuple, set] = {}
    for i, t in toks.items():
        for p in range(len(t) - window + 1):
            owners.setdefault(tuple(t[p : p + window]), set()).add(i)
    shared = {w for w, o in owners.items() if len(o) >= 2}
    out = {}
    for i, t in toks.items():
        covered: set[int] = set()
        for p in range(len(t) - window + 1):
            if tuple(t[p : p + window]) in shared:
                covered.update(range(p, p + window))
        keep = [tok for j, tok in enumerate(t) if j not in covered]
        out[i] = (len(t), len(t) - len(keep), " ".join(keep))
    return out


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_remove_shared_substrings_matches_brute_force(spark, corpus):
    texts = [" ".join(toks) for toks in corpus]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dd.remove_shared_substrings(df, window=WINDOW).collect()
    }
    assert got == _brute_scrub(texts, WINDOW)


edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    max_size=20,
)


def _brute_components(nodes: set[int], edges: list[tuple]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to the component MINIMUM (the operator's label contract)
    comp: dict[int, list] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=4,  # each example runs BOTH strategies; hash-min is
    # multi-round, so 4 examples keep the test under a minute
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy, extra=st.sets(st.integers(0, 12), max_size=4))
def test_connected_components_both_strategies_match_brute_force(
    spark, edges, extra
):
    nodes = {n for e in edges for n in e} | extra
    if not nodes:
        nodes = {0}
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a bigint, id_b bigint"
    )
    if not edges:
        pairs = pairs.limit(0)
    node_df = spark.createDataFrame(
        [(n,) for n in sorted(nodes)], "doc_id bigint"
    )
    want = _brute_components(nodes, edges)
    for limit in (2_000_000, 0):  # driver union-find, then hash-min
        got = {
            r.doc_id: r.cluster_id
            for r in dd.connected_components(
                pairs, node_df, driver_edge_limit=limit
            ).collect()
        }
        assert got == want, f"strategy driver_edge_limit={limit}"

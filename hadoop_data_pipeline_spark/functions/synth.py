"""Deterministic synthetic embedding fixtures for ANN diagnostics.

The shipped test corpus's embeddings are random-structure (no planted
neighborhoods), which makes absolute ANN recall numbers nearly
meaningless there: on isotropic random vectors every candidate is
almost equidistant, so an LSH recall of 0.02 is indistinguishable
from a broken bucketing. Real embedding corpora are CLUSTERED — near
neighbors exist and quantizers have structure to learn. This module
generates that shape deterministically so the recall ladder
(`tools/ann_recall.py`) and the recall-floor tests can measure
retrieval quality against a fixture where high recall is achievable
and a regression is therefore VISIBLE.

Mixture of Gaussians on the unit sphere: ``n_clusters`` unit-norm
centers, each point = its cluster's center + isotropic noise. With
``sigma=0.12`` at dim 64, within-cluster cosine sits around
``1/sqrt(1 + sigma^2 * dim)`` ~ 0.72 while cross-cluster cosine
centers on the (near-orthogonal) center dot products — tight enough
that the cluster IS the neighborhood, loose enough that
within-cluster distance differences exceed PQ quantization error
(an ultra-tight sigma makes every rung but IVF look broken because
ranking inside a near-degenerate cluster needs more resolution than
8x16 codes carry) — the separation
every real retrieval corpus has and the random fixture lacks.

Schema matches the test corpus's ``embeddings`` table
(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT — label = the true
cluster, handy as a blocking/filter column).
"""

from __future__ import annotations


def clustered_embedding_rows(
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.12,
    seed: int = 7,
) -> list[tuple[int, list[float], int]]:
    """``[(vec_id, embedding, label)]`` rows of the clustered fixture.
    Pure numpy with a fixed-seed RandomState — byte-stable across
    runs, platforms and numpy versions new enough for this repo."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n)
    pts = (centers[assign] + sigma * rng.randn(n, dim)).astype("float32")
    return [
        (i, [float(x) for x in pts[i]], int(assign[i])) for i in range(n)
    ]


def clustered_embeddings_df(
    spark,
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.12,
    seed: int = 7,
):
    """The fixture as a DataFrame with the test corpus's embeddings
    schema."""
    return spark.createDataFrame(
        clustered_embedding_rows(
            n=n, dim=dim, n_clusters=n_clusters, sigma=sigma, seed=seed
        ),
        "vec_id bigint, embedding array<float>, label int",
    )

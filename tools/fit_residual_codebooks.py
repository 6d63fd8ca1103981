"""Fit-and-pin the RESIDUAL product-quantization codebooks.

Like ``tools/fit_pq_codebooks.py`` but trained on ``x -
centroid[cell(x)]`` residuals against the pinned IVF centroids
(``functions/ivf_centroids.py``) — the FAISS-style IVF-PQ refinement:
the residual distribution is tighter than the raw one, so the same
code budget quantizes with less error. This artifact DEPENDS on the
centroids: regenerate it whenever ``tools/fit_ivf_centroids.py``
runs.

    python tools/fit_residual_codebooks.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_data_pipeline_spark",
    "functions",
    "pq_residual_codebooks.py",
)

HEADER = '''"""Pinned RESIDUAL PQ codebooks (GENERATED — do not edit).

Regenerate with ``python tools/fit_residual_codebooks.py`` (and
whenever the IVF centroids are refit — this artifact depends on
them). Fitted by :func:`hadoop_data_pipeline_spark.operators.
similarity.fit_residual_codebooks` on
``{fixture}/embeddings.parquet`` (m={m}, k={k}, d_sub={d}, seed 42)
against functions/ivf_centroids.py.
"""

SF001_RESIDUAL_CODEBOOKS: list[list[list[float]]] = [
'''


def main() -> None:
    from hadoop_data_pipeline_spark.functions.ivf_centroids import (
        SF001_CENTROIDS,
    )
    from hadoop_data_pipeline_spark.operators.similarity import (
        fit_residual_codebooks,
    )
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark.sources.readers import load_table

    spark = get_session("fit-residual-codebooks")
    emb = load_table(spark, FIXTURE, "embeddings")
    cbs = fit_residual_codebooks(emb, SF001_CENTROIDS, m=8, k=16)
    again = fit_residual_codebooks(emb, SF001_CENTROIDS, m=8, k=16)
    assert cbs == again, "residual codebook fit is not deterministic"

    with open(OUT, "w") as f:
        f.write(
            HEADER.format(
                fixture=FIXTURE, m=len(cbs), k=len(cbs[0]), d=len(cbs[0][0])
            )
        )
        for cb in cbs:
            f.write("    [\n")
            for cw in cb:
                f.write("        [\n")
                for i in range(0, len(cw), 4):
                    f.write(
                        "            "
                        + ", ".join(repr(v) for v in cw[i : i + 4])
                        + ",\n"
                    )
                f.write("        ],\n")
            f.write("    ],\n")
        f.write("]\n")
    print(
        f"wrote {len(cbs)}x{len(cbs[0])}x{len(cbs[0][0])} residual codebooks to {OUT}"
    )


if __name__ == "__main__":
    main()

"""Fit-and-pin the IVF coarse quantizer for the driver fixture.

Runs :func:`fit_coarse_quantizer` on the sf0.01 embeddings fixture and
writes the resulting centroids into
``hadoop_data_pipeline_spark/functions/ivf_centroids.py`` as a plain
Python literal — the "versioned quantizer artifact" shape described in
``operators/similarity.py``: train once, pin the ~kilobyte model, apply
it to every later corpus snapshot. Pinning is what makes
``embedding_ann_ivf_topk`` SQL-expressible for the DuckDB oracle
(assignment/probe/score over CONSTANT centroids is pure relational
algebra — no trained state left on the Spark side).

Run from the repo root whenever the fixture or the quantizer fit
changes::

    python tools/fit_ivf_centroids.py

The fit is deterministic (crc32 hash-sample + seeded k-means++/Lloyd),
verified here by fitting twice and asserting equality.
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
    "ivf_centroids.py",
)

HEADER = '''"""Pinned IVF coarse-quantizer centroids (GENERATED — do not edit).

Regenerate with ``python tools/fit_ivf_centroids.py``. Fitted by
:func:`hadoop_data_pipeline_spark.operators.similarity.fit_coarse_quantizer`
on ``{fixture}/embeddings.parquet`` ({n} centroids, dim {dim}, seed 42).

This is the production IVF shape at 100 TB: the coarse quantizer is a
versioned ~kilobyte artifact trained ONCE on a capped sample, not a
per-query fit — every later corpus snapshot reuses it, keeping cell
assignment a pure codegen'd projection and making the whole ANN query
expressible as relational algebra over constant centroids (which is
also what lets the DuckDB oracle hash-check it exactly).
"""

SF001_CENTROIDS: list[list[float]] = [
'''


def main() -> None:
    from hadoop_data_pipeline_spark.operators.similarity import (
        fit_coarse_quantizer,
    )
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark.sources.readers import load_table

    spark = get_session("fit-ivf-centroids")
    emb = load_table(spark, FIXTURE, "embeddings")
    cents = fit_coarse_quantizer(emb, n_centroids=16)
    again = fit_coarse_quantizer(emb, n_centroids=16)
    assert cents == again, "quantizer fit is not deterministic"

    with open(OUT, "w") as f:
        f.write(HEADER.format(fixture=FIXTURE, n=len(cents), dim=len(cents[0])))
        for c in cents:
            f.write("    [\n")
            for i in range(0, len(c), 4):
                f.write(
                    "        "
                    + ", ".join(repr(v) for v in c[i : i + 4])
                    + ",\n"
                )
            f.write("    ],\n")
        f.write("]\n")
    print(f"wrote {len(cents)}x{len(cents[0])} centroids to {OUT}")


if __name__ == "__main__":
    main()

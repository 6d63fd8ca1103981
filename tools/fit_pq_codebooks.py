"""Fit-and-pin the product-quantization codebooks for the driver fixture.

Runs :func:`fit_pq_codebooks` on the sf0.01 embeddings fixture and
writes the resulting codebooks into
``hadoop_data_pipeline_spark/functions/pq_codebooks.py`` as a plain
Python literal — the same versioned-artifact shape as the IVF
centroids (``tools/fit_ivf_centroids.py``): train once, pin the
~kilobyte model, apply it to every later corpus snapshot. Pinning is
what makes ``embedding_pq_topk`` SQL-expressible for the DuckDB
oracle (encode/reconstruct/ADC over CONSTANT codebooks is pure
relational algebra).

Run from the repo root whenever the fixture or the quantizer fit
changes::

    python tools/fit_pq_codebooks.py

The fit is deterministic (crc32 hash-sample + seeded k-means++/Lloyd
per subvector), verified here by fitting twice and asserting equality.
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
    "pq_codebooks.py",
)

HEADER = '''"""Pinned product-quantization codebooks (GENERATED — do not edit).

Regenerate with ``python tools/fit_pq_codebooks.py``. Fitted by
:func:`hadoop_data_pipeline_spark.operators.similarity.fit_pq_codebooks`
on ``{fixture}/embeddings.parquet`` (m={m} subvectors, k={k} codewords,
d_sub={d}, seed 42).

``SF001_CODEBOOKS[s][j]`` is codeword ``j`` of subvector ``s``. With
m=8/k=16 on dim-64 float32, a 256-byte vector compresses to eight
4-bit codes — the memory side of ANN at 100 TB; constant codebooks
also make the PQ query exactly SQL-expressible for the DuckDB oracle.
"""

SF001_CODEBOOKS: list[list[list[float]]] = [
'''


def main() -> None:
    from hadoop_data_pipeline_spark.operators.similarity import (
        fit_pq_codebooks,
    )
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark.sources.readers import load_table

    spark = get_session("fit-pq-codebooks")
    emb = load_table(spark, FIXTURE, "embeddings")
    cbs = fit_pq_codebooks(emb, m=8, k=16)
    again = fit_pq_codebooks(emb, m=8, k=16)
    assert cbs == again, "codebook fit is not deterministic"

    with open(OUT, "w") as f:
        f.write(
            HEADER.format(
                fixture=FIXTURE,
                m=len(cbs),
                k=len(cbs[0]),
                d=len(cbs[0][0]),
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
        f"wrote {len(cbs)}x{len(cbs[0])}x{len(cbs[0][0])} codebooks to {OUT}"
    )


if __name__ == "__main__":
    main()

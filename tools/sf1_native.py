"""~sf1 dedup datapoint on a NATIVE corpus with a controlled
duplicate rate — the pair-generator complement to tools/sf1_point.py.

sf1_point's 10-copy key-shifted corpus is the right scale axis for
linear-plan queries, but it multiplies every document VERBATIM, so
cross-copy identical texts inflate candidate-pair counts
super-linearly by construction: the >2 obs/pred ratios it reports for
the pair-generator family measure the copy-built corpus, not the
plan (SCALE.md's r11 adjudication). This tool generates documents
NATIVELY at two scales with the SAME duplicate profile
(`functions/synth.py::synthetic_document_rows`: 5% verbatim dups +
5% 2-token near-dups, duplicate-cluster size bounded at 3), so the
true pair count is O(n) at every n — obs/pred near 1 now measures the
PLAN's scaling, and a super-linear ratio on this corpus would be a
real plan bug.

Prediction anchor: the query's warm native-5k seconds on THIS seat ×
its fitted 0.01→0.1 growth factor from SCALING.json (the portable
part of the curve, same convention as sf1_point).

Usage: python tools/sf1_native.py [query ...]
Prints a markdown table (paste into SCALE.md) plus output-row counts
at both scales as evidence the duplicate profile is scale-invariant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The pair-generator family the copy-built corpus could not measure.
DEFAULT = [
    "simhash_near_dup_pairs",
    "near_dup_pairs_minhash",
    "ngram_jaccard_pairs_lang",
    "dedup_exact_docs",
]

N_SMALL = 5_000   # sf0.1-equivalent document count
N_BIG = 50_000    # ~sf1


def main() -> int:
    names = sys.argv[1:] or DEFAULT

    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.functions.synth import (
        synthetic_documents_df,
    )
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("sf1_native")
    dirs = {}
    t0 = time.perf_counter()
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        d = f"/tmp/spark_graft_native-{os.getpid()}-{label}"
        synthetic_documents_df(spark, n=n).coalesce(8).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "documents.parquet"))
        dirs[label] = d
    print(
        f"built native corpora ({N_SMALL} + {N_BIG} docs, 5% exact + "
        f"5% near dups) in {time.perf_counter() - t0:.0f}s"
    )

    scaling_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    scaling = (
        json.load(open(scaling_path)) if os.path.exists(scaling_path) else {}
    )

    print(
        "\n| query | native-5k (s) | rows@5k | predicted 50k (s) "
        "| observed 50k (s) | rows@50k | obs/pred |\n"
        "|---|---|---|---|---|---|---|"
    )
    worst = 0.0
    for name in names:
        fn = qc.QUERIES[name]
        stats = {}
        for label in ("small", "big"):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            out = fn(spark, dirs[label])
            rows = out.count()
            stats[label] = (time.perf_counter() - t0, rows)
        factor = (scaling.get(name, {}).get("growth_per_10x") or [None, None])[1]
        pred = stats["small"][0] * factor if factor else None
        ratio = stats["big"][0] / pred if pred else None
        worst = max(worst, ratio or 0.0)
        print(
            f"| `{name}` | {stats['small'][0]:.2f} | {stats['small'][1]} | "
            f"{f'{pred:.2f}' if pred else 'n/a'} | {stats['big'][0]:.2f} | "
            f"{stats['big'][1]} | {f'{ratio:.2f}' if ratio else '—'} |"
        )
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
    print(
        f"\nworst obs/pred: {worst:.2f} (<~1.5 = the pair generators "
        f"scale with the plan on a duplicate-rate-controlled corpus)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

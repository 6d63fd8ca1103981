"""One measured ~sf1 datapoint for the heavy-tail queries.

`SCALING.json` fits each query's growth over the sf0.001 → 0.01 → 0.1
decades and SCALE.md §6 sizes the 100 TB run from those curves — all
EXTRAPOLATION above sf0.1. This tool adds one measured point a decade
up: it builds a 10-copy key-shifted corpus from sf0.1 (the stress
builder — copies shift every key by KEY_STRIDE, so distinct keys and
rows both scale 10x, the same axis the sf ladder scales) and times
the heavy-tail queries on it, reporting observed seconds next to the
prediction from the fitted curve (sf0.1 seconds × the 0.01→0.1
growth factor — the factor the curve says another decade costs).

An observed/predicted ratio near 1 confirms the curve; >>1 flags a
plan that went super-linear only above the fixture scales (the
failure extrapolation cannot see). Cache is cleared and the JVM
nudged between queries, mirroring bench.py.

Usage: python tools/sf1_point.py [query ...]
Writes/updates the "sf1 datapoint" table printed to stdout; paste
into SCALE.md (kept manual so the measured row carries its seat's
calibration context).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The catalog's heavy tail at sf0.1 (BENCH_DETAILS top entries whose
#: plans do real distributed work — scan-bound trivia would only
#: measure the constant term) plus the two heaviest ANN rungs.
DEFAULT = [
    "ngram_jaccard_pairs_lang",
    "clean_corpus",
    "pagerank_part_supplier",
    "hard_negative_pairs_embeddings",
    "prepare_training_shards",
    "user_event_gap_stats",
    "benchmark_contamination",
    "simhash_near_dup_pairs",
    "near_dup_pairs_minhash",
    "dedup_clusters_minhash",
    "substring_scrub_docs",
    "embedding_ann_ivfpq_residual_topk",
    "incremental_near_dup_new_docs",
    "pricing_summary",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT

    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.session import get_session
    from tools.stress import build

    spark = get_session("sf1_point")
    out_dir = f"/tmp/spark_graft_sf1-{os.getpid()}"
    t0 = time.perf_counter()
    build(spark, "/root/testdata/sf0.1", out_dir, copies=10)
    print(f"built 10x sf0.1 (~sf1) in {time.perf_counter() - t0:.0f}s")

    scaling = {}
    scaling_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    if os.path.exists(scaling_path):
        scaling = json.load(open(scaling_path))

    print(
        f"\n| query | sf0.1 (s) | predicted sf1 (s) | observed sf1 (s) "
        f"| obs/pred |\n|---|---|---|---|---|"
    )
    worst = 0.0
    for name in names:
        fn = qc.QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        # warm sf0.1 reference on THIS seat (predictions from
        # SCALING.json were another seat's absolute seconds; the
        # growth FACTOR is the portable part, so anchor it here)
        t0 = time.perf_counter()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
            "overwrite"
        ).save()
        base_s = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, out_dir).write.format("noop").mode("overwrite").save()
        big_s = time.perf_counter() - t0
        factor = (scaling.get(name, {}).get("growth_per_10x") or [None, None])[1]
        pred = base_s * factor if factor else None
        ratio = big_s / pred if pred else None
        worst = max(worst, ratio or 0.0)
        print(
            f"| `{name}` | {base_s:.2f} | "
            f"{f'{pred:.2f}' if pred else 'n/a (not in SCALING.json)'} | "
            f"{big_s:.2f} | {f'{ratio:.2f}' if ratio else '—'} |"
        )
    shutil.rmtree(out_dir, ignore_errors=True)
    print(
        f"\nworst obs/pred ratio: {worst:.2f} "
        f"(<~2 = curve confirmed within seat noise; >>2 = super-linear "
        f"growth the sf ladder could not see)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

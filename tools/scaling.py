"""Scaling-curve measurement: time a representative catalog subset at
sf0.001 / sf0.01 / sf0.1 in ONE session and report the per-decade
runtime growth factor for each query.

The point: "would this plan survive 100x" is partly answerable below
100 TB — a query whose runtime grows ~linearly across two decades of
input (factor ~<=12x per 10x data, allowing constant overhead to
dominate the small end) is shuffle/agg-bound the way its plan says it
is; a super-linear factor flags quadratic pair blowup or a collapsing
single task. Constant-dominated queries (sub-second everywhere) show
factors near 1 — also fine. The red flag is ONLY a large factor on
the 0.01 -> 0.1 edge, where fixed overhead no longer hides growth.

Usage: python tools/scaling.py [--merge] [query ...]
Writes SCALING.json at the repo root when run with no explicit list;
``--merge`` folds an explicit list's measurements into the existing
SCALING.json (how new catalog families join the fitted-curve ledger
without re-timing the whole subset).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

#: One representative per plan family (scan, agg, join, window,
#: pair-gen, kernel, graph, recursive, stream-window, scrub).
DEFAULT = [
    "membership_filter",
    "pricing_summary",
    "revenue_by_nation",
    "latest_event_per_user_type",
    "rolling_7d_user_value",
    "dedup_exact_docs",
    "near_dup_pairs_minhash",
    "ngram_jaccard_pairs_lang",
    "simhash_near_dup_pairs",
    "substring_scrub_docs",
    "benchmark_contamination",
    "embedding_cosine_topk",
    "embedding_ann_lsh_topk",
    # the r9/r10 ANN ladder: codes-only ADC scan, IVF-pruned ADC, and
    # margin-ranked multi-probe — each must hold the same ~linear
    # growth as the brute/LSH baselines (their plans claim the probe
    # side is corpus-independent; the curve is the receipt)
    "embedding_pq_topk",
    "embedding_ann_ivfpq_topk",
    "embedding_ann_multiprobe_topk",
    "kmeans_refine_cluster_stats",
    "user_event_gap_stats",
    "pagerank_part_supplier",
    "bom_rollup_recursive",
    "tumbling_daily_event_stats",
    "cdc_upsert_orders",
    "keyword_search_bm25",
    "train_val_test_split",
]


def main() -> None:
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark import queries_catalog as qc

    merge = "--merge" in sys.argv[1:]
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or DEFAULT
    spark = get_session("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for name in names:
        fn = qc.QUERIES[name]
        times = []
        for sf in SFS:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        g1 = round(times[1] / times[0], 2) if times[0] else None
        g2 = round(times[2] / times[1], 2) if times[1] else None
        out[name] = {
            "sec": dict(zip(["sf0.001", "sf0.01", "sf0.1"], times)),
            "growth_per_10x": [g1, g2],
        }
        print(f"{name}: {times} growth {g1}x, {g2}x")
    explicit = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not explicit or merge:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json",
        )
        if merge and os.path.exists(path):
            with open(path) as fh:
                merged = json.load(fh)
            merged.update(out)
            out = merged
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()

"""Warm best-of-3 adjudication of flagged bench readings.

The documented regression-adjudication recipe (BENCH_NOTES, applied by
hand in r14/r15) as a tool:

    python tools/bench_adjudicate.py QUERY [QUERY ...]
    python tools/bench_adjudicate.py --old BENCH_DETAILS_old.json \
        --new BENCH_DETAILS.json QUERY ...

For each named query: run it 3 times back-to-back in ONE warm session
against $SPARK_GRAFT_SF_DIR (default sf0.1) through the same noop sink
bench.py uses, and report the minimum ("warm best-of-3"). When --old /
--new snapshots are given, also seat-normalize their readings by the
jvm_mc calib ratio and print a verdict per query:

* ``NOISE``   — warm best-of-3 is within NOISE_BAND of the old
  seat-normalized reading (the flagged new reading was cold-start /
  CPU-steal, not a code regression);
* ``REGRESSION`` — warm best-of-3 is still over the band;
* ``IMPROVED`` — warm best-of-3 beats the old reading by the band.

The warm loop removes the single largest noise source the r10-r15
adjudications kept re-finding: first-iteration codegen/JIT/page-cache
cold start (2-6x swings on sub-second queries, e.g. the r15
pagerank_part_supplier bench reading 10.5 s vs warm 3.1 s).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_BAND = 1.33  # the documented same-day seat swing (BENCH_NOTES)
REPS = 3


def warm_best(spark, fn, sf_dir: str) -> tuple[float, list[float]]:
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--old", help="baseline BENCH_DETAILS snapshot (json)")
    ap.add_argument("--new", help="flagged BENCH_DETAILS snapshot (json)")
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()

    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    old = json.load(open(args.old)) if args.old else None
    new = json.load(open(args.new)) if args.new else None
    ratio = (
        new["calib"]["jvm_mc_sec"] / old["calib"]["jvm_mc_sec"]
        if old and new
        else None
    )
    if ratio:
        print(f"seat ratio (new/old jvm_mc): {ratio:.3f}")

    spark = get_session("bench_adjudicate")
    # Warm the session once so the first adjudicated query does not
    # absorb session-level cold start (same rationale as bench.py).
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = []
    for name in args.queries:
        fn = qc.QUERIES[name]
        spark.sparkContext.setJobDescription(f"adjudicate: {name}")
        best, times = warm_best(spark, fn, sf_dir)
        verdict = ""
        if old and name in old.get("queries", {}):
            t_old = old["queries"][name]
            r = best / t_old
            verdict = (
                "IMPROVED" if r < 1 / NOISE_BAND
                else "NOISE" if r <= NOISE_BAND
                else "REGRESSION"
            )
            verdict = f" old={t_old:.3f} warm/old={r:.2f} -> {verdict}"
        print(f"{name}: warm_best={best:.3f} reps={times}{verdict}")
        rows.append((name, best, times))
    spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())

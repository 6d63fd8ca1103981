"""Count Spark jobs/stages/tasks a catalog query executes (VERDICT r16
item 1: stage-count latency is the remaining local cost on multi-stage
queries — job/stage count is the metric that tracks it, independent of
seat noise).

Usage:
    python tools/stage_count.py QUERY [QUERY ...] [--reps N]

For each named query: run it through the same noop sink bench.py uses
in ONE warm session and report, from ``sc.statusTracker()`` job/stage
ids observed before vs after, the number of jobs, stages and tasks the
materialization submitted, plus warm wall seconds (min over reps).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("stage_count")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {}
    for name in args.queries:
        fn = qc.QUERIES[name]
        best = None
        jobs_n = stages_n = tasks_n = None
        for rep in range(args.reps):
            spark.catalog.clearCache()
            st = sc.statusTracker()
            jobs_before = set(st.getJobIdsForGroup())
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            jobs_after = set(st.getJobIdsForGroup())
            new_jobs = sorted(jobs_after - jobs_before)
            stages, tasks = set(), 0
            for j in new_jobs:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    if s in stages:
                        continue
                    stages.add(s)
                    si = st.getStageInfo(s)
                    if si is not None:
                        tasks += si.numTasks
            if best is None or dt < best:
                best = dt
                jobs_n, stages_n, tasks_n = len(new_jobs), len(stages), tasks
        out[name] = {
            "warm_min_sec": round(best, 3),
            "jobs": jobs_n,
            "stages": stages_n,
            "tasks": tasks_n,
        }
        print(f"{name}: {out[name]}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

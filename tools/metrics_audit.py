"""Measured-execution audit: run catalog queries and report REAL
Spark SQL metrics (shuffle bytes written, spill, file-scan bytes) per
query from the SQLAppStatusStore — the numbers behind the plan-shape
claims in SCALE.md ("shuffles digests, not text", "broadcast side
never shuffles", ...).

Plans show WHAT would shuffle; this shows HOW MUCH did. A refactor
that keeps the plan shape but silently inflates exchanged bytes (say,
a dropped column prune inside a struct) is invisible to the plan
audit in tests/test_plans.py and loud here.

Usage:
    python tools/metrics_audit.py [sf_dir] [query ...]

Writes METRICS.json next to the repo root when run over the full
catalog (no explicit query list); prints one line per query either
way:  <query>  shuffle=<bytes>  spill=<bytes>  scan=<bytes>
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: SQL metric display names summed per query (node-level metrics are
#: aggregated across the whole physical plan).
METRIC_KEYS = {
    "shuffle bytes written": "shuffle_bytes",
    "spill size": "spill_bytes",
    "size of files read": "scan_bytes",
}

_UNITS = {
    "B": 1,
    "KiB": 1024,
    "MiB": 1024**2,
    "GiB": 1024**3,
    "TiB": 1024**4,
}


def parse_bytes(text: str) -> int:
    """'24.4 KiB' -> 24986; metric values may also arrive as
    'total (min, med, max (stageId: taskId))\n24.4 KiB (...)' — the
    leading aggregate is what we take."""
    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", text)
    if not m:
        return 0
    return int(float(m.group(1)) * _UNITS[m.group(2)])


def measure(spark, fn, sf_dir: str) -> dict[str, int]:
    """Execute one catalog query end-to-end (noop sink) and aggregate
    its SQL metrics from the status store."""
    store = spark._jsparkSession.sharedState().statusStore()
    # Track by monotonic executionId, not list POSITION: the status
    # store evicts old entries past spark.sql.ui.retainedExecutions,
    # after which positional ranges silently go empty and every
    # metric would read 0.
    prior = store.executionsList()
    last_id = (
        prior.apply(prior.size() - 1).executionId() if prior.size() else -1
    )
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    execs = store.executionsList()
    out = {v: 0 for v in METRIC_KEYS.values()}
    # A query may run several executions (eager sub-jobs: sample
    # collects, adaptive re-optimizations register under one id, but
    # driver-side collects are their own) — attribute all of them.
    for i in range(execs.size()):
        ex = execs.apply(i)
        if ex.executionId() <= last_id:
            continue
        vals = store.executionMetrics(ex.executionId())
        mets = ex.metrics()
        for j in range(mets.size()):
            m = mets.apply(j)
            key = METRIC_KEYS.get(m.name())
            if key is None:
                continue
            v = vals.get(m.accumulatorId())
            if v.isDefined():
                out[key] += parse_bytes(v.get())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark import queries_catalog as qc

    spark = get_session("metrics_audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names = only or list(qc.QUERIES)
    results: dict[str, dict[str, int]] = {}
    for name in names:
        spark.catalog.clearCache()
        try:
            results[name] = measure(spark, qc.QUERIES[name], sf_dir)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {ex}", file=sys.stderr)
            continue
        r = results[name]
        print(
            f"{name}  shuffle={r['shuffle_bytes']}"
            f"  spill={r['spill_bytes']}  scan={r['scan_bytes']}"
        )
    if not only:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "METRICS.json",
        )
        with open(path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": results}, fh, indent=1,
                      sort_keys=True)
        print(f"wrote {path}: {len(results)} queries")


if __name__ == "__main__":
    main()

"""Measured-execution audit: run catalog queries and report REAL
Spark execution metrics (shuffle bytes written, spill, input bytes)
per query from per-STAGE app-status data — the numbers behind the
plan-shape claims in SCALE.md ("shuffles digests, not text",
"broadcast side never shuffles", ...). Stage metrics, not SQL node
metrics: see measure() — AQE re-plans duplicate node accumulators
and overcounted bytes 4-6x before r13.

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
    its SQL metrics from the status store — summing each ACCUMULATOR
    at most once.

    r13 fix: under AQE, every adaptive re-plan lists the executed
    stage's node metrics AGAIN in ``ex.metrics()`` (same accumulator
    id, repeated entries), so the pre-r13 sum overcounted scan and
    shuffle bytes by the number of plan iterations — measured 5x on
    the image near-dup query and 4-6x across the multi-exchange
    catalog (AQE off: exactly 1x; the single scan accumulator id 146
    appeared five times). Every pre-r13 METRICS.json byte number for
    a multi-exchange query carries that inflation; zero-spill claims
    were unaffected (0 x N = 0). Deduping by accumulator id restores
    physical truth while keeping the parquet-accurate 'size of files
    read' node metric (stage-level inputBytes under-reports local-fs
    parquet reads and was rejected as the fix)."""
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
        seen: set[int] = set()
        for j in range(mets.size()):
            m = mets.apply(j)
            key = METRIC_KEYS.get(m.name())
            if key is None:
                continue
            acc = m.accumulatorId()
            if acc in seen:
                continue  # AQE re-plan relisted the same accumulator
            seen.add(acc)
            v = vals.get(acc)
            if v.isDefined():
                out[key] += parse_bytes(v.get())
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark import queries_catalog as qc

    spark = get_session("metrics_audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names = only or list(qc.QUERIES)
    results: dict[str, dict[str, int]] = {}
    failed: list[str] = []
    for name in names:
        spark.catalog.clearCache()
        try:
            results[name] = measure(spark, qc.QUERIES[name], sf_dir)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {ex}", file=sys.stderr)
            failed.append(name)
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
        spilled = sorted(
            n for n, r in results.items() if r["spill_bytes"] > 0
        )
        print(
            f"wrote {path}: {len(results)}/{len(qc.QUERIES)} queries, "
            f"{len(spilled)} with spill"
            + (f" ({', '.join(spilled)})" if spilled else "")
        )
    # Gate contract (r14 verdict #2): full-catalog runs must cover
    # EVERY registered query — a new entry with no committed metrics
    # is exactly how the r14 binary-payload movers escaped the
    # zero-spill audit. Spills at standard memory are reported above,
    # not failed here: the spill-rehearsal tool owns that behavior.
    if failed:
        return 1
    if not only and len(results) != len(qc.QUERIES):
        print(
            f"coverage gap: measured {len(results)} of "
            f"{len(qc.QUERIES)} registered queries",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Snapshot `.explain("formatted")` output for catalog queries to files.

Usage:
    python tools/plan_snapshot.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each named query (all
catalog queries when none are named). ``suffix`` is typically
``before`` or ``after``; the optimization-round deliverable is the
pair ``plans/r16/<query>_before.txt`` / ``..._after.txt``.

The plan is captured at sf0.001 on a small local session — plan SHAPE
(exchanges, join strategies, pushed filters, Python stages) is what
the snapshot pins; timings come from bench.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.001")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from hadoop_data_pipeline_spark import queries_catalog as qc
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("plan_snapshot", master="local[4]", shuffle_partitions=4)
    if not names:
        names = list(qc.QUERIES)
    for name in names:
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                qc.QUERIES[name](spark, SF_DIR).explain("formatted")
        except Exception as ex:  # noqa: BLE001 - record, keep going
            buf.write(f"\nEXPLAIN FAILED: {ex}\n")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Quantizer drift advisory over two embedding snapshots (CLI).

Assigns both snapshots to the PINNED coarse quantizer
(`functions/ivf_centroids.py`), computes the per-cell Population
Stability Index, and prints the re-fit advisory
(`operators/similarity.py::drift_refit_advisory`): corpus-level
psi_total, a status in {stable, watch, refit} against the
conventional 0.1/0.2 PSI bands, and the flagged hotspot cells.

``refit`` means: follow docs/QUANTIZER_DRIFT_RUNBOOK.md — re-run the
fit tools (fit_ivf_centroids / fit_pq_codebooks /
fit_residual_codebooks), re-pin the generated constants, re-run
tools/artifact_gate.py, re-materialize stores that persisted cells or
codes, and reset the drift baseline. This tool NEVER mutates the
artifacts — it is the alarm, not the actuator.

Usage:
    python tools/drift_advisory.py BASE_PARQUET CUR_PARQUET [vec_col]

Exit code: 0 stable, 1 watch, 2 refit (cron-friendly).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 64
    base_dir, cur_dir = sys.argv[1], sys.argv[2]
    vec_col = sys.argv[3] if len(sys.argv) > 3 else "embedding"

    from hadoop_data_pipeline_spark.functions.ivf_centroids import (
        SF001_CENTROIDS,
    )
    from hadoop_data_pipeline_spark.operators import similarity as sim
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("drift-advisory")
    advisory = sim.drift_refit_advisory(
        sim.cell_population_drift(
            spark.read.parquet(base_dir),
            spark.read.parquet(cur_dir),
            SF001_CENTROIDS,
            vec_col=vec_col,
        )
    )
    rows = sorted(advisory.collect(), key=lambda r: r["cell"])
    status = rows[0]["status"] if rows else "stable"
    psi_total = rows[0]["psi_total"] if rows else 0.0
    print(f"psi_total={psi_total}  status={status}")
    flagged = [r for r in rows if r["cell_flagged"]]
    for r in flagged:
        print(
            f"  cell {r['cell']:>3}: share {r['share_base']:.4f} -> "
            f"{r['share_cur']:.4f}  psi_contrib={r['psi_contrib']}"
        )
    if status == "refit":
        print(
            "ACTION: re-fit + re-pin the quantizer artifacts "
            "(docs/QUANTIZER_DRIFT_RUNBOOK.md)"
        )
    return {"stable": 0, "watch": 1, "refit": 2}[status]


if __name__ == "__main__":
    raise SystemExit(main())

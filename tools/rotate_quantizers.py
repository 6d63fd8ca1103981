"""Quantizer artifact rotation — the automated re-fit path the drift
advisory points at (r13 verdict next #6).

``docs/QUANTIZER_DRIFT_RUNBOOK.md`` describes the manual procedure;
this tool executes its artifact steps end-to-end so a ``refit``
advisory has a one-command response:

1. **advisory** — PSI between the drift baseline and the fit snapshot
   under the CURRENTLY pinned centroids (the alarm being answered).
2. **re-fit in dependency order** — ``fit_ivf_centroids`` →
   ``fit_pq_codebooks`` → ``fit_residual_codebooks`` against the fit
   snapshot (``SPARK_GRAFT_ORACLE_SF_DIR``), regenerating the three
   ``functions/*.py`` constant modules.
3. **re-pin** — re-derive ``ASSIGN_CRC_SF001`` (the sf0.01 assignment
   checksum under the NEW centroids) via the gate's ``REPIN`` mode
   and rewrite the constant in ``tools/artifact_gate.py``.
4. **verify** — a clean ``artifact_gate`` run, then the ANN recall
   ladder (``tools/ann_recall.py``) so the operator sees the new
   operating point before committing.

What it deliberately does NOT do (runbook steps 4-5): re-materialize
stores that persisted ``cell``/PQ codes under the old artifacts, or
reset the drift baseline — those touch production state outside this
repo and stay explicit operator actions. It also never commits:
rotation produces a reviewable working-tree diff (three regenerated
modules + one checksum), and reverting is the same command pointed
back at the previous fit snapshot (the fits are deterministic, so
rotating back reproduces the prior artifacts byte-for-byte —
rehearsed in COVERAGE.md r14).

Usage:
    python tools/rotate_quantizers.py FIT_DIR [--baseline BASE_DIR]
    python tools/rotate_quantizers.py --verify-only
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "artifact_gate.py")
DEFAULT_BASELINE = "/root/testdata/sf0.01"


def run(cmd: list[str], env: dict | None = None) -> subprocess.CompletedProcess:
    e = dict(os.environ)
    if env:
        e.update(env)
    print(f"+ {' '.join(cmd)}")
    return subprocess.run(
        cmd, cwd=REPO, env=e, capture_output=True, text=True
    )


def advisory(baseline: str, fit_dir: str) -> str:
    """Print the drift advisory between baseline and fit snapshot
    under the CURRENT pinned centroids; returns the status string."""
    sys.path.insert(0, REPO)
    from hadoop_data_pipeline_spark.functions.ivf_centroids import (
        SF001_CENTROIDS,
    )
    from hadoop_data_pipeline_spark.operators import similarity as sim
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("rotate_quantizers")
    base = spark.read.parquet(f"{baseline}/embeddings.parquet")
    cur = spark.read.parquet(f"{fit_dir}/embeddings.parquet")
    adv = sim.drift_refit_advisory(
        sim.cell_population_drift(base, cur, SF001_CENTROIDS)
    )
    rows = adv.collect()
    psi_total = float(rows[0].psi_total) if rows else 0.0
    status = rows[0].status if rows else "stable"
    flagged = sum(1 for r in rows if r.cell_flagged)
    print(
        f"advisory: psi_total={psi_total:.4f} status={status} "
        f"flagged_cells={flagged}"
    )
    return status


def refit(fit_dir: str) -> None:
    env = {"SPARK_GRAFT_ORACLE_SF_DIR": fit_dir}
    for tool in (
        "fit_ivf_centroids.py",
        "fit_pq_codebooks.py",
        "fit_residual_codebooks.py",  # depends on the new centroids
    ):
        r = run([sys.executable, os.path.join("tools", tool)], env)
        print(r.stdout.strip())
        if r.returncode != 0:
            raise SystemExit(f"{tool} failed:\n{r.stderr}")


def repin_assignment_crc() -> None:
    r = run([sys.executable, GATE], {"SPARK_GRAFT_REPIN": "1"})
    m = re.search(r"ASSIGN_CRC_SF001 = (\d+)", r.stdout)
    if not m:
        raise SystemExit(
            f"repin run printed no checksum (other drift?):\n{r.stdout}"
        )
    new_crc = m.group(1)
    src = open(GATE).read()
    src, n = re.subn(
        r"^ASSIGN_CRC_SF001 = \d+", f"ASSIGN_CRC_SF001 = {new_crc}",
        src, count=1, flags=re.M,
    )
    assert n == 1
    open(GATE, "w").write(src)
    print(f"re-pinned ASSIGN_CRC_SF001 = {new_crc}")


def verify() -> int:
    rc = 0
    g = run([sys.executable, GATE])
    print(g.stdout.strip())
    if g.returncode != 0:
        print(g.stderr.strip())
        rc = 1
    rec = run([sys.executable, os.path.join("tools", "ann_recall.py")])
    # recall table goes to stdout; print the summary lines
    tail = [ln for ln in rec.stdout.splitlines() if ln.strip()][-12:]
    print("\n".join(tail))
    if rec.returncode != 0:
        rc = 1
    return rc


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser(
        description="Quantizer artifact rotation (see module docstring)"
    )
    parser.add_argument("fit_dir", nargs="?", default=None,
                        help="snapshot directory to re-fit against")
    parser.add_argument("--baseline", default=DEFAULT_BASELINE,
                        help="drift-advisory baseline snapshot")
    parser.add_argument("--verify-only", action="store_true",
                        help="run artifact_gate + recall ladder only")
    opts = parser.parse_args()
    if opts.verify_only:
        return verify()
    if opts.fit_dir is None:
        print(__doc__)
        return 2
    fit_dir = opts.fit_dir
    baseline = opts.baseline
    status = advisory(baseline, fit_dir)
    if status == "stable":
        print(
            "advisory is stable — rotation not indicated; proceeding "
            "anyway (explicit operator request)"
        )
    refit(fit_dir)
    repin_assignment_crc()
    rc = verify()
    print(
        "rotation "
        + ("COMPLETE — review the working-tree diff, re-run the strict "
           "oracle sweep, then commit" if rc == 0 else "FAILED verification")
    )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

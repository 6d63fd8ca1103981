"""Property-based checks of the temporal kernels against brute-force
references: :func:`temporal.asof_join` (backward at-or-before match
with deterministic tie-breaks) and :func:`temporal.scd2_history`
(gaps-and-islands run collapse). Hypothesis generates event streams
with heavy timestamp COLLISIONS — a tiny timestamp domain makes
equal-ts left/right rows, equal-ts right ties, and same-ts state
flips common, exactly the edges the windowed implementations must get
right and the fixtures rarely produce."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_data_pipeline_spark.operators import temporal as tp

# (key, ts, value) with ts drawn from 0-5: collisions everywhere.
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.integers(0, 9)),
    max_size=14,
)


def _brute_asof(left, right):
    """For each left row, the right row in the same key with the
    greatest ts <= left ts; ties on ts broken by max tie id (the
    operator's 'last in (ts, tie) order wins' contract)."""
    out = []
    for lk, lt, lv in left:
        best = None
        for rk, rt, (rid, rv) in right:
            if rk == lk and rt <= lt:
                cand = (rt, rid, rv)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        out.append(((lk, lt, lv), best))
    return out


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_brute_force(spark, left, right):
    if not left:
        left = [(0, 0, 0)]
    # unique ids on both sides: the right id doubles as the tie-break
    ldf = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(left)],
        "k bigint, ts bigint, lval bigint, lid bigint",
    )
    rdf = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(right)],
        "k bigint, ts bigint, rid bigint, rval bigint",
    )
    got = {
        r.lid: (r.asof_ts, r.asof_rid, r.asof_rval)
        for r in tp.asof_join(
            ldf,
            rdf,
            on=["k"],
            ts_col="ts",
            payload_cols=["rid", "rval"],
            tie_cols=["rid"],
            how="left",
        ).collect()
    }
    want_pairs = _brute_asof(
        left, [(k, t, (i, v)) for i, (k, t, v) in enumerate(right)]
    )
    for lid, (_lrow, best) in enumerate(want_pairs):
        if best is None:
            assert got[lid] == (None, None, None), f"lid={lid}"
        else:
            assert got[lid] == best, f"lid={lid}"


def _row_key(t):
    # tuples contain a None valid_to; sort None last deterministically
    return tuple((v is None, 0 if v is None else v) for v in t)


def _brute_scd2(rows):
    """Collapse (key, ts, state, tie) events into runs of equal
    consecutive state in (ts, tie) order."""
    out = []
    bykey: dict = {}
    for k, t, s, tie in rows:
        bykey.setdefault(k, []).append((t, tie, s))
    for k, evs in bykey.items():
        evs.sort()
        runs = []  # (state, valid_from, n)
        for t, _tie, s in evs:
            if runs and runs[-1][0] == s:
                runs[-1][2] += 1
            else:
                runs.append([s, t, 1])
        for i, (s, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((k, s, vf, vt, n))
    return sorted(out, key=_row_key)


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_scd2_history_matches_brute_force(spark, rows):
    if not rows:
        rows = [(0, 0, 0)]
    # tie = event index; state domain 0-2 makes runs and flips common
    data = [(k, t, v % 3, i) for i, (k, t, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k bigint, ts bigint, state bigint, tie bigint"
    )
    got = sorted(
        (
            (r.k, r.state, r.valid_from, r.valid_to, r.n_events)
            for r in tp.scd2_history(
                df, ["k"], "state", "ts", tie_cols=["tie"]
            ).collect()
        ),
        key=_row_key,
    )
    assert got == _brute_scd2(data)

def _brute_debounce(rows, gap_s):
    """Python reference for debounce_flags: per (user, type) in
    (ts, event_id) order, kept iff first or gap from the PREVIOUS ROW
    (kept or not) exceeds gap_s — microsecond-exact."""
    out = {}
    by_key = {}
    for eid, uid, typ, ts in rows:
        by_key.setdefault((uid, typ), []).append((ts, eid))
    for seq in by_key.values():
        seq.sort()
        prev = None
        for ts, eid in seq:
            out[eid] = prev is None or (ts - prev) > gap_s * 1_000_000
            prev = ts
    return out


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),      # user
            st.integers(0, 1),      # type
            st.integers(0, 8),      # coarse ts slot -> collisions
            st.integers(0, 1),      # sub-slot: exactly-gap boundaries
        ),
        max_size=14,
    )
)
def test_debounce_flags_match_brute_force(spark, rows):
    """Debounce vs the python reference over adversarial streams:
    duplicate timestamps inside a key (ordering falls to event_id)
    and gaps landing EXACTLY on the boundary (strict > contract)."""
    from hadoop_data_pipeline_spark.operators import queries as Q

    gap_s = 10
    data = []
    for eid, (u, t, slot, sub) in enumerate(rows):
        # slots are exactly one gap apart; sub shifts half a gap so
        # consecutive rows produce gaps of 0, gap/2, gap and 3*gap/2.
        ts_us = (slot * gap_s + sub * gap_s // 2) * 1_000_000
        data.append((eid, u, f"t{t}", ts_us))
    if not data:
        data = [(0, 0, "t0", 0)]
    df = spark.createDataFrame(
        [
            (eid, u, t, __import__("datetime").datetime.utcfromtimestamp(
                us / 1_000_000
            ))
            for eid, u, t, us in data
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {
        r.event_id: r.kept
        for r in Q.debounce_flags(
            df, ["user_id", "event_type"], gap_seconds=gap_s
        ).collect()
    }
    want = _brute_debounce(
        [(eid, u, t, us) for eid, u, t, us in data], gap_s
    )
    assert got == want

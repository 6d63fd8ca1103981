"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10/§2.11).

The reference has no stateful processing; this is the engine's
extension point for semantics windowed aggregation can't express —
here, a per-key running aggregate (count / sum / last event time)
emitted on every micro-batch, with state kept in the state store and
carried across batches and restarts (checkpointed).

Arrow moves each key-group to Python as pandas batches — the
documented slow path relative to JVM expressions, acceptable because
state logic runs once per key per micro-batch, not per row. Per-key state must
stay small and bounded; unbounded per-key growth belongs in a keyed
state store with TTL (set ``GroupStateTimeout`` accordingly).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)
_STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _update_running_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """State update: fold this micro-batch's rows for one user into
    (count, sum, max ts) and emit the new running totals."""
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((n, round(total, 2), last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [last_ts],
        }
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals (update mode). ``events``
    must be a streaming DataFrame with (user_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

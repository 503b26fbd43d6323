from __future__ import annotations

import datetime as dt

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.streaming import incremental


def _write_events(spark, path):
    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, base, "click"),
        (2, base + dt.timedelta(minutes=10), "click"),
        (3, base + dt.timedelta(hours=1, minutes=5), "view"),
    ]
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING"
    ).write.mode("overwrite").parquet(path)


def test_windowed_counts_available_now(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src)
    stream = incremental.stream_from_files(
        spark, src, "event_id LONG, ts TIMESTAMP, event_type STRING"
    )
    assert stream.isStreaming
    agg = incremental.windowed_counts(stream)
    incremental.run_to_memory_sink(agg, "win_counts", str(tmp_path / "ckpt"))
    rows = spark.sql("SELECT * FROM win_counts").collect()
    got = {(r["window_start"].hour, r["event_type"]): r["n_events"] for r in rows}
    assert got[(10, "click")] == 2
    assert got[(11, "view")] == 1


def test_file_stream_exactly_once_ledger(spark, tmp_path):
    # the checkpoint IS the processed-file ledger (T2): re-running with
    # the same checkpoint must not reprocess already-seen files
    src = str(tmp_path / "files")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt2")
    spark.createDataFrame([(1,)], "v LONG").write.mode("append").parquet(src)
    stream = incremental.stream_from_files(spark, src, "v LONG")
    incremental.drain_available_now(stream, ckpt, out)
    n1 = spark.read.parquet(out).count()
    # second drain with same checkpoint: no new files -> no new rows
    stream2 = incremental.stream_from_files(spark, src, "v LONG")
    incremental.drain_available_now(stream2, ckpt, out)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 1
    # a NEW file is picked up incrementally
    spark.createDataFrame([(2,)], "v LONG").write.mode("append").parquet(src)
    stream3 = incremental.stream_from_files(spark, src, "v LONG")
    incremental.drain_available_now(stream3, ckpt, out)
    assert spark.read.parquet(out).count() == 2


def test_session_windows_stream(spark, tmp_path):
    src = str(tmp_path / "sess_events")
    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, base, 7), (2, base + dt.timedelta(minutes=5), 7),
        (3, base + dt.timedelta(hours=3), 7),
    ]
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG"
    ).write.mode("overwrite").parquet(src)
    stream = incremental.stream_from_files(
        spark, src, "event_id LONG, ts TIMESTAMP, user_id LONG"
    )
    sess = incremental.session_windows(stream, key_col="user_id")
    incremental.run_to_memory_sink(sess, "sessions", str(tmp_path / "ckpt3"))
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) == 2  # two sessions (3h gap splits)
    counts = sorted(r["n_events"] for r in rows)
    assert counts == [1, 2]


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Real watermark semantics (T1's streaming twin): after batch 1
    advances event time, a batch-2 row older than the watermark is
    DROPPED from the aggregation instead of updating its window."""
    src = str(tmp_path / "wm_events")
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    t = dt.datetime(2024, 1, 1, 10, 0)

    def write(rows, mode):
        spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, event_type STRING"
        ).write.mode(mode).parquet(src)

    def drain():
        stream = incremental.stream_from_files(
            spark, src, "event_id LONG, ts TIMESTAMP, event_type STRING"
        )
        agg = incremental.windowed_counts(stream, late_threshold="10 minutes")
        incremental.drain_foreach_batch_to_parquet(agg, ckpt, out)
        return spark.read.parquet(out).collect()

    write([(1, t, "click"), (2, t + dt.timedelta(hours=3), "click")], "overwrite")
    drain()  # watermark advances to ~12:50

    # batch 2: one fresh row and one hopelessly late row (09:30)
    write(
        [(3, t + dt.timedelta(hours=3, minutes=5), "click"),
         (4, t - dt.timedelta(minutes=30), "click")],
        "append",
    )
    rows = drain()
    by_window = {}
    for r in rows:
        key = (r["window_start"].hour, r["event_type"])
        by_window[key] = max(by_window.get(key, 0), r["n_events"])
    assert by_window[(13, "click")] == 2   # fresh row updated its window
    # the 09:00 window was emitted once (n=1) in batch 1 and NEVER
    # updated by the late row — still 1
    assert by_window[(10, "click")] == 1
    assert (9, "click") not in by_window or by_window[(9, "click")] == 0


def test_streaming_scd2_cdc_upsert(spark, tmp_path):
    """CDC stream -> SCD2 dimension through foreachBatch: versions
    accumulate across micro-batch drains and a re-drain on the same
    checkpoint leaves the dimension unchanged.  (Note scd2_merge is
    itself idempotent for a repeated identical batch — the update
    equals the new current so a re-merge no-ops; the checkpoint
    ledger's no-reprocessing guarantee is proven separately by
    test_file_stream_exactly_once_ledger.)"""
    import datetime as dt

    from pyspark.sql import functions as F

    dim_path = str(tmp_path / "dim")
    src = str(tmp_path / "updates")
    ckpt = str(tmp_path / "ckpt_scd")

    spark.createDataFrame(
        [(1, "gold", dt.datetime(2023, 1, 1), None, True),
         (2, "bronze", dt.datetime(2023, 1, 1), None, True)],
        "key LONG, seg STRING, valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN",
    ).write.parquet(dim_path)

    schema = "key LONG, seg STRING, effective_ts TIMESTAMP"

    def drain():
        stream = incremental.stream_from_files(spark, src, schema)
        incremental.drain_scd2_upsert(
            stream, dim_path, ckpt, "key", ["seg"]
        )

    # batch 1: change key 1, add key 3
    spark.createDataFrame(
        [(1, "plat", dt.datetime(2024, 1, 1)), (3, "new", dt.datetime(2024, 1, 1))],
        schema,
    ).write.mode("append").parquet(src)
    drain()
    d1 = spark.read.parquet(dim_path)
    assert d1.count() == 4  # closed gold + current plat/bronze/new
    cur = {r["key"]: r["seg"] for r in d1.filter("is_current").collect()}
    assert cur == {1: "plat", 2: "bronze", 3: "new"}

    # batch 2: change key 1 again
    spark.createDataFrame(
        [(1, "diamond", dt.datetime(2025, 1, 1))], schema
    ).write.mode("append").parquet(src)
    drain()
    d2 = spark.read.parquet(dim_path)
    assert d2.count() == 5
    assert d2.filter("key = 1").count() == 3  # gold -> plat -> diamond
    closed_plat = d2.filter(
        (F.col("key") == 1) & (F.col("seg") == "plat")
    ).collect()[0]
    assert not closed_plat["is_current"]
    assert closed_plat["valid_to"] == dt.datetime(2025, 1, 1)

    # re-drain with no new files: checkpoint ledger -> zero re-merge
    drain()
    assert spark.read.parquet(dim_path).count() == 5

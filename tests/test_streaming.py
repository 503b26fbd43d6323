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

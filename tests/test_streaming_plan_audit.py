"""Streaming-plan audit gate: every streaming query's state must be
watermark-bounded.

The batch plan audit (test_plan_audit.py) exempts ``streaming_*``
queries because their plans cannot be built batch-side; until round 7
that left the 10 streaming AUX rows with correctness oracles but no
anti-pattern gate — nothing would catch a stateful stream whose state
nothing evicts (unbounded dropDuplicates, an un-watermarked aggregate,
a stream-stream join buffering both sides forever).

This gate runs ``streaming_audit_flags`` over every entry of
``queries.STREAMING_PLAN_BUILDERS`` — the PRE-SINK streaming
DataFrames, built without draining (cheap: plan analysis only).  The
detector itself is exercised by planting each unbounded shape and
asserting the auditor fires, the same proof-the-gate-works discipline
as the batch audit.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from plan_audit import hard_flags, streaming_audit_flags  # noqa: E402

SF_DIR_AUDIT = "/root/testdata/sf0.01"


def test_every_streaming_plan_is_state_bounded(spark):
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark import queries as q

    failures = {}
    for name, builder in q.STREAMING_PLAN_BUILDERS.items():
        df = builder(spark, SF_DIR_AUDIT)
        assert df.isStreaming, f"{name}: builder returned a batch plan"
        hard = hard_flags(streaming_audit_flags(df))
        if hard:
            failures[name] = hard
    assert not failures, f"unbounded streaming state: {failures}"


@pytest.fixture()
def stream_events(spark, tmp_path):
    """A small streaming events source over a parquet dir."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "ev")
    spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def test_detector_catches_unwatermarked_agg(stream_events):
    flags = streaming_audit_flags(
        stream_events.groupBy("event_type").count()
    )
    assert "UNBOUNDED-AGG" in flags


def test_detector_catches_unbounded_dedup(stream_events):
    flags = streaming_audit_flags(
        stream_events.dropDuplicates(["event_id"])
    )
    assert "UNBOUNDED-DEDUP" in flags


def test_detector_passes_watermarked_window_agg(stream_events):
    from pyspark.sql import functions as F

    good = (
        stream_events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    assert hard_flags(streaming_audit_flags(good)) == []


def test_detector_passes_dedup_within_watermark(stream_events):
    good = stream_events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    assert hard_flags(streaming_audit_flags(good)) == []


def _join_sides(stream_events, watermark: bool):
    from pyspark.sql import functions as F

    l = stream_events.select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts")
    )
    r = stream_events.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    if watermark:
        l = l.withWatermark("l_ts", "1 hour")
        r = r.withWatermark("r_ts", "1 hour")
    return l, r


def test_detector_catches_stream_join_without_time_bound(stream_events):
    from pyspark.sql import functions as F

    l, r = _join_sides(stream_events, watermark=True)
    flags = streaming_audit_flags(
        l.join(r, F.col("l_user") == F.col("r_user"))
    )
    assert "STREAM-JOIN-NO-TIME-BOUND" in flags


def test_detector_catches_stream_join_without_watermark(stream_events):
    from pyspark.sql import functions as F

    l, r = _join_sides(stream_events, watermark=False)
    flags = streaming_audit_flags(
        l.join(r, F.col("l_user") == F.col("r_user"))
    )
    assert "STREAM-JOIN-NO-WATERMARK" in flags


def test_detector_passes_time_bounded_stream_join(stream_events):
    from pyspark.sql import functions as F

    l, r = _join_sides(stream_events, watermark=True)
    good = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    assert hard_flags(streaming_audit_flags(good)) == []


def test_detector_rejects_batch_frame(spark):
    with pytest.raises(ValueError):
        streaming_audit_flags(spark.range(3))

from __future__ import annotations

import datetime as dt

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.snapshots import (
    latest_snapshot,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.plans import mapping
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.sharepoint import (
    RemoteFile,
)

CSV_V1 = (
    b"EPIC_DEPT_ID,DEPT_BUS_STRCTR,FRCST_YN,MWOD_YES_NO,STF_MATRX_YES_NO\n"
    b"10,org/e/ny/cc1/u1/d1,Yes,yes,YES\n"
    b",org/e/ny/cc2/u2/d2,No,no,NO\n"          # NULL key -> dropped
    b"12,,Yes,yes,NO\n"                         # NULL key -> dropped
    b"13,org/e/ny/cc3/u3/d3,no,yes,YES\n"
)
CSV_V2 = (
    b"EPIC_DEPT_ID,DEPT_BUS_STRCTR,FRCST_YN,MWOD_YES_NO,STF_MATRX_YES_NO\n"
    b"10,org/e/ny/cc1/u1/d1,Yes,yes,YES\n"
)


def test_refresh_mapping_full_cycle(spark, tmp_path):
    control = str(tmp_path / "control")
    table = str(tmp_path / "mapping")
    t1 = dt.datetime(2023, 4, 12, 14, 30)
    t2 = t1 + dt.timedelta(days=1)
    state = {"content": CSV_V1, "mtime": t1}

    def fetcher():
        return RemoteFile(content=state["content"], last_modified=state["mtime"])

    now1 = dt.datetime(2023, 4, 12, 14, 35, tzinfo=dt.timezone.utc)
    out = mapping.refresh_mapping(spark, fetcher, control, table, now=now1)
    assert out is not None
    persisted = spark.read.parquet(table)
    assert persisted.count() == 2  # null-key rows dropped
    assert {r["epic_dept_id"] for r in persisted.collect()} == {10, 13}

    # unchanged source: the whole pipeline skips (T4)
    assert mapping.refresh_mapping(spark, fetcher, control, table, now=now1) is None

    # modified source: re-ingest appends a new RUN_ID version
    state.update(content=CSV_V2, mtime=t2)
    now2 = dt.datetime(2023, 4, 13, 14, 35, tzinfo=dt.timezone.utc)
    assert mapping.refresh_mapping(spark, fetcher, control, table, now=now2) is not None
    all_rows = spark.read.parquet(table)
    assert all_rows.count() == 3
    latest = latest_snapshot(all_rows, "run_id")
    assert latest.count() == 1  # latest snapshot sees only v2
    assert latest.first()["epic_dept_id"] == 10


def test_change_gate_tz_aware_mtime_and_probe(spark, tmp_path):
    """Graph returns tz-AWARE mtimes; the control table round-trips
    tz-naive — the gate must compare them without TypeError.  A
    metadata probe must skip the download entirely when unchanged."""
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources import (
        sharepoint,
    )

    control = str(tmp_path / "control")
    aware = dt.datetime(2023, 4, 12, 10, 0, tzinfo=dt.timezone.utc)
    downloads = []

    def fetcher():
        downloads.append(1)
        return sharepoint.RemoteFile(b"EPIC_DEPT_ID,DEPT_BUS_STRCTR\n1,a\n", aware)

    first = sharepoint.check_modified(spark, fetcher, control, "m")
    assert first is not None
    sharepoint.commit_last_modified(spark, control, "m", first)
    # second check with tz-aware mtime: no TypeError, correctly skipped
    assert sharepoint.check_modified(spark, fetcher, control, "m") is None
    # with a probe, the skip happens WITHOUT a download
    n_before = len(downloads)
    assert (
        sharepoint.check_modified(spark, fetcher, control, "m", probe=lambda: aware)
        is None
    )
    assert len(downloads) == n_before  # fetcher never called


def test_failed_ingest_does_not_advance_watermark(spark, tmp_path, monkeypatch):
    """The commit-after-append ordering (refresh_mapping's R6-style
    discipline): when the versioned append raises, the change-gate
    watermark must NOT advance — the next run with the SAME remote
    mtime must retry the ingest instead of skipping it forever."""
    import pytest

    control = str(tmp_path / "control")
    table = str(tmp_path / "mapping")
    t1 = dt.datetime(2023, 4, 12, 14, 30)
    remote = RemoteFile(content=CSV_V1, last_modified=t1)

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(mapping, "append_versioned", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        mapping.refresh_mapping(
            spark, lambda: remote, control, table, now=t1
        )
    monkeypatch.undo()
    # same mtime, healthy writer: the gate must let the retry through
    out = mapping.refresh_mapping(
        spark, lambda: remote, control, table, now=t1
    )
    assert out is not None and out.count() == 2  # NULL-key rows dropped
    # and only now is the watermark committed: a third run skips
    assert (
        mapping.refresh_mapping(spark, lambda: remote, control, table, now=t1)
        is None
    )

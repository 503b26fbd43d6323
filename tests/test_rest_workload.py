from __future__ import annotations

import datetime as dt
import json

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.plans import workload
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sinks import writers
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources import rest_source

NOW = dt.datetime(2023, 4, 12, 9, 10, tzinfo=dt.timezone.utc)


def _workload_doc(org_id, qualifier):
    return {
        "data": {
            "children": [
                {
                    "key": {
                        "SCHEDULE_COVERAGE_SCHEDULED_COUNT": "12",
                        "SCHEDULE_WORKLOAD_PLANNED_COUNT": "10",
                    },
                    "coreEntityKey": {
                        "ORG": {"id": str(org_id), "qualifier": qualifier},
                        "DAY": {"id": "2023-04-12"},
                        "SCH_ZONE": {"id": "3", "qualifier": "Days"},
                    },
                    "attributes": [
                        {"key": "SCH_WORKLOAD_PLANNED_COUNT_JOB", "value": "RN"},
                        {"key": "SCH_WORKLOAD_PLANNED_COUNT_DATE", "value": "4/12/2023"},
                    ],
                }
            ]
        }
    }


def test_build_qbe_body_backfill_range():
    body = json.loads(
        rest_source.build_qbe_body(["K1"], ["org/a", "org/b"], "2023-04-01", "2023-04-12")
    )
    # the API's own query shape (select/from/locations/dateRange)
    assert body["select"] == [{"key": "K1"}]
    assert body["from"]["locations"]["qualifiers"] == ["org/a", "org/b"]
    assert body["from"]["dateRange"] == {
        "startDate": "2023-04-01", "endDate": "2023-04-12",
    }


def test_fetch_documents_batching_and_skip():
    calls = []

    def transport(url, body):
        quals = json.loads(body)["from"]["locations"]["qualifiers"]
        calls.append(quals)
        if "bad" in quals:
            return 500, "boom"
        return 200, json.dumps(_workload_doc(1, quals[0]))

    docs, report = rest_source.fetch_documents(
        "http://x", transport, ["K1"], ["a", "bad", "c"], "2023-04-01", "2023-04-02",
        batch_size=1,
    )
    # one POST per qualifier batch plus the shrink-to-1 retry of "bad"
    assert len(calls) == 4
    assert len(docs) == 2
    # R3: the failure is RECORDED, never silently dropped
    assert [q for q, _ in report.failed] == ["bad"]
    assert report.succeeded == ["a", "c"]


def test_valid_qualifiers_latest_snapshot(spark):
    mapping = spark.createDataFrame(
        [
            (1, "yes", "org/a"), (2, "Yes", "org/b"),
            (2, "no", "org/c"), (2, "yes", "org/b"),
        ],
        "run_id LONG, mwod_yes_no STRING, dept_bus_strctr STRING",
    )
    assert workload.valid_qualifiers(mapping) == ["org/b"]


def test_ingest_workload_end_to_end(spark, tmp_path):
    def transport(url, body):
        quals = json.loads(body)["from"]["locations"]["qualifiers"]
        return 200, json.dumps(_workload_doc(hash(quals[0]) % 1000, quals[0]))

    master_path = str(tmp_path / "master")
    child_path = str(tmp_path / "child")
    master, child, report = workload.ingest_workload(
        spark, "http://x", transport, ["org/a", "org/b"],
        "2023-04-01", "2023-04-12", master_path, child_path,
        run_id=writers.make_run_id(NOW), now=NOW,
    )
    assert report.ok
    m = spark.read.parquet(master_path)
    assert m.count() == 2
    assert {r["org_qlfr"] for r in m.collect()} == {"org/a", "org/b"}
    assert set(m.columns) >= {"org_id", "day_id", "schdl_zn_id", "run_id",
                              "row_insert_tsp"}
    c = spark.read.parquet(child_path)
    assert c.count() == 2
    assert c.first()["plnd_cnt_dt"] == dt.date(2023, 4, 12)


def test_ingest_staffing_end_to_end(spark, tmp_path):
    doc = json.dumps(
        [{
            "id": 7, "name": "ICU", "description": "d",
            "staffingMatrixRanges": [{
                "lowRange": 0.0, "highRange": 5.5,
                "staffingMatrixItems": [{
                    "item": {"id": 1, "qualifier": "RN"},
                    "scheduleZone": {"id": 3, "qualifier": "Days"},
                    "column": {"id": 9, "qualifier": "Cnt"},
                    "columnNumber": 1, "staffingCount": 2.0,
                }],
            }],
        }]
    )
    master, child = workload.ingest_staffing(
        spark, [doc], str(tmp_path / "m"), str(tmp_path / "c"),
        run_id=writers.make_run_id(NOW), now=NOW,
    )
    m = spark.read.parquet(str(tmp_path / "m"))
    c = spark.read.parquet(str(tmp_path / "c"))
    assert m.first()["stf_matrx_nm"] == "ICU"
    assert float(c.first()["stf_cnt"]) == 2.0
    assert c.first()["col_nbr"] == 1

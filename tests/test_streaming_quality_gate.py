"""The streaming expectation gate: per-micro-batch audit routing good
batches to the ingest path and failing batches — whole — to
quarantine, with the audit trail stamped by batch id."""

import os

from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.streaming import incremental

_SCHEMA = "id LONG, v DOUBLE"
_EXPECTATIONS = [
    {"column": "id", "kind": "not_null"},
    {"column": "v", "kind": "range", "lo": 0, "hi": 10},
]


def _write_file(spark, directory, name, rows):
    # one parquet file per directory write; maxFilesPerTrigger=1 makes
    # each file its own micro-batch
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(directory, name))


def test_quality_gate_routes_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_file(spark, src, "clean", [(1, 1.0), (2, 2.0), (3, 3.0)])
    _write_file(spark, src, "dirty", [(4, 4.0), (None, 99.0)])

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src + "/*")
    )
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    audit = str(tmp_path / "audit")
    incremental.drain_quality_gated(
        stream,
        _EXPECTATIONS,
        good,
        quar,
        str(tmp_path / "ckpt"),
        audit_path=audit,
    )

    good_rows = spark.read.parquet(good).collect()
    quar_rows = spark.read.parquet(quar).collect()
    assert {r["id"] for r in good_rows} == {1, 2, 3}
    assert len(quar_rows) == 2  # the WHOLE dirty batch, clean row too
    assert {r["id"] for r in quar_rows} == {4, None}

    audits = spark.read.parquet(audit).collect()
    # two batches x two expectations
    assert len(audits) == 4
    by = {(r["batch_id"], r["column"], r["expectation"]): r for r in audits}
    failing = [r for r in audits if not r["passed"]]
    assert {(r["column"], r["expectation"]) for r in failing} == {
        ("id", "not_null"),
        ("v", "range"),
    }
    # both failures carry the same (dirty) batch id
    assert len({r["batch_id"] for r in failing}) == 1


def test_quality_gate_checkpoint_no_reprocess(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_file(spark, src, "a", [(1, 1.0)])
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(src + "/*")
        )
        incremental.drain_quality_gated(
            stream, _EXPECTATIONS, good, quar, ckpt
        )

    drain()
    _write_file(spark, src, "b", [(2, 2.0)])
    drain()  # same checkpoint: file 'a' must not be re-ingested
    good_rows = spark.read.parquet(good).collect()
    assert sorted(r["id"] for r in good_rows) == [1, 2]
    assert not os.path.exists(quar) or not any(
        f.endswith(".parquet") for f in os.listdir(quar)
    )

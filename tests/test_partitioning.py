from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sinks import writers

NOW = dt.datetime(2023, 4, 12, 15, 30, tzinfo=dt.timezone.utc)


def test_date_partitioned_write_prunes(spark, tmp_path):
    """Bronze tables partition by ingest date (SURVEY section 4) so
    snapshot readers prune partitions instead of scanning history."""
    path = str(tmp_path / "bronze")
    for day in (1, 2, 3):
        df = spark.createDataFrame(
            [(i, f"2023-04-0{day}") for i in range(10)], "v INT, ingest_dt STRING"
        )
        writers.append_versioned(
            df, path, run_id=writers.make_run_id(NOW) + day, now=NOW,
            partition_by=["ingest_dt"],
        )
    full = spark.read.parquet(path)
    assert full.count() == 30
    pruned = full.filter(F.col("ingest_dt") == "2023-04-02")
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the date predicate must land in PartitionFilters (directory-level
    # pruning), not a post-scan row filter.  (inputFiles() can't verify
    # this — it lists the relation's files before pruning applies.)
    assert "PartitionFilters: [isnotnull(ingest_dt" in plan
    assert "ingest_dt#" in plan.split("PartitionFilters")[1][:200]


def test_ivf_topk_recall(spark):
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators import (
        similarity,
    )
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.registry import (
        load_table,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = similarity.brute_force_topk(e, probes, k=10)
    approx = similarity.ivf_topk(e, probes, k=10, nprobe=4, n_centroids=16)
    ex = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["probe_id"], r["vec_id"]) for r in approx.collect()}
    assert len(ex & ap) / len(ex) >= 0.3
    assert all((p, p) in ap for p in range(3))  # self always found

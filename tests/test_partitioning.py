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


def test_zorder_layout_clusters_2d_ranges(spark, tmp_path):
    """Z-ordered layout must keep BOTH dimensions skippable: a
    single-column-sorted layout prunes its own axis and scatters the
    other across every file, while Z-order confines range predicates
    on either axis to a subset of files.  Files containing matches ==
    files a stats-based reader must touch."""
    from pyspark.sql import functions as F

    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.layout import write_zordered

    n_files = 16
    # hash-derived dims: statistically independent (a multiplier
    # lattice like id*7919 % 1000 leaves per-file y-coverage at the
    # mercy of arithmetic structure and upstream partitioning)
    df = (
        spark.range(20_000)
        .withColumn("x", F.pmod(F.xxhash64("id"), F.lit(1000)))
        .withColumn("y", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)))
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, "x", "y", num_files=n_files)
    # baseline: same file count, sorted by x only (the best 1-D layout)
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(spath)

    def files_touched(path, pred):
        data = spark.read.parquet(path)
        got = (
            data.filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        total = data.select(F.input_file_name().alias("f")).distinct().count()
        return got, total

    # the 1-D layout's weak axis: y-range predicates scatter over
    # (nearly) every x-sorted file, but stay clustered under Z-order
    y_pred = F.col("y") < 100
    zy_hit, z_total = files_touched(zpath, y_pred)
    sy_hit, s_total = files_touched(spath, y_pred)
    assert sy_hit >= 3 * s_total // 4, "x-sort should scatter y widely"
    assert zy_hit <= z_total // 2, f"z-order touched {zy_hit}/{z_total} for y-range"
    assert zy_hit < sy_hit, (zy_hit, sy_hit)
    # and the x axis stays prunable under Z-order too (that is the
    # trade: both axes partially sorted instead of one fully)
    zx_hit, _ = files_touched(zpath, F.col("x") < 100)
    assert zx_hit <= z_total // 2, f"z-order touched {zx_hit}/{z_total} for x-range"
    # identical rows either way
    rect = (F.col("x") < 100) & (F.col("y") < 100)
    assert (
        spark.read.parquet(zpath).filter(rect).count()
        == spark.read.parquet(spath).filter(rect).count()
    )


def test_morton_n_roundtrip(spark):
    """The n-D interleave must be invertible: deinterleaving the
    computed code in python recovers every quantized coordinate (bit
    placement i*n+j verified exactly, 3 dims x 10 bits)."""
    from pyspark.sql import functions as F

    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.layout import morton_interleave_n

    bits, n = 10, 3
    df = spark.range(500).select(
        F.pmod(F.xxhash64("id"), F.lit(1 << bits)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1 << bits)).alias("b"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1 << bits)).alias("c"),
    )
    out = df.withColumn(
        "z", morton_interleave_n([F.col("a"), F.col("b"), F.col("c")], bits)
    ).collect()

    def deinterleave(z, j):
        return sum(((z >> (i * n + j)) & 1) << i for i in range(bits))

    for r in out:
        assert (
            deinterleave(r["z"], 0),
            deinterleave(r["z"], 1),
            deinterleave(r["z"], 2),
        ) == (r["a"], r["b"], r["c"])

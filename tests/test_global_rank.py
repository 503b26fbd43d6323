"""Distributed prefix-sum rank/cumsum operators: equivalence against
the single-task unpartitioned-window forms they replace.

The contract under test: ``global_cumsum`` / ``global_rank`` /
``global_ntile_pct`` (operators/windows.py) and
``roc_auc_distributed`` (operators/stats.py) produce BIT-IDENTICAL
results to ``Window.orderBy(...)`` forms while keeping every stage
parallel (range repartition -> per-slice window -> broadcast offsets).
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators import (
    stats,
    windows,
)


def _synthetic(spark, n=500, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, rng.randint(0, 49) / 10.0, rng.random() < 0.4)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id LONG, v DOUBLE, y BOOLEAN")


def test_global_cumsum_matches_window(spark):
    df = _synthetic(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expect = {
        r["id"]: r["c"]
        for r in df.select("id", F.sum("v").over(w).alias("c")).collect()
    }
    got = {
        r["id"]: r["c"]
        for r in windows.global_cumsum(
            df, order, {"v": "c"}, partitions=8
        ).collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9, k


def test_global_cumsum_releases_staged_cache(spark):
    """The staged (range-partitioned, pid-stamped) frame is persisted
    for determinism; the handle must ride the result through every
    wrapper (.drop in global_rank, the tile select in global_ntile_pct)
    so release_components() actually unpersists it — Spark's cache
    manager never releases on GC."""
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.graph import (
        release_components,
    )

    df = _synthetic(spark, n=200)
    order = [F.col("v").asc(), F.col("id").asc()]
    for fn in (
        lambda: windows.global_cumsum(df, order, {"v": "c"}, partitions=4),
        lambda: windows.global_rank(df, order, partitions=4),
        lambda: windows.global_ntile_pct(df, order, 4, partitions=4),
    ):
        before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        out = fn()
        out.collect()
        assert release_components(out) is True
        after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        assert after <= before


def test_global_rank_matches_row_number(spark):
    df = _synthetic(spark)
    order = [F.col("v").desc(), F.col("id").asc()]
    expect = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    got = {
        r["id"]: r["rank"]
        for r in windows.global_rank(df, order, partitions=8).collect()
    }
    assert got == expect


def test_global_ntile_pct_matches_sql_semantics(spark):
    # n = 503 rows, k = 10: n % k = 3, so SQL ntile gives the first 3
    # tiles 51 rows and the rest 50 — the exact uneven-split semantics
    df = _synthetic(spark, n=503)
    order = [F.col("v").asc(), F.col("id").asc()]
    w = Window.orderBy(*order)
    expect = {
        r["id"]: (r["t"], round(r["p"], 9))
        for r in df.select(
            "id",
            F.ntile(10).over(w).alias("t"),
            F.percent_rank().over(w).alias("p"),
        ).collect()
    }
    got = {
        r["id"]: (r["tile"], round(r["pct_rank"], 9))
        for r in windows.global_ntile_pct(
            df, order, 10, partitions=8
        ).collect()
    }
    assert got == expect


def test_global_ntile_fewer_rows_than_tiles(spark):
    # n < k: every row its own tile, pct_rank well-defined (n=1 -> 0.0)
    df = spark.createDataFrame([(1, 5.0), (2, 3.0), (3, 9.0)], "id LONG, v DOUBLE")
    order = [F.col("v").asc(), F.col("id").asc()]
    out = {
        r["id"]: (r["tile"], r["pct_rank"])
        for r in windows.global_ntile_pct(df, order, 10, partitions=4).collect()
    }
    assert out == {2: (1, 0.0), 1: (2, 0.5), 3: (3, 1.0)}
    one = windows.global_ntile_pct(
        spark.createDataFrame([(1, 5.0)], "id LONG, v DOUBLE"), order, 10
    ).collect()
    assert (one[0]["tile"], one[0]["pct_rank"]) == (1, 0.0)


def test_roc_auc_distributed_matches_window_form(spark):
    df = _synthetic(spark, n=800, seed=11)
    a = stats.roc_auc(df, "v", "y").collect()[0]
    b = stats.roc_auc_distributed(df, "v", "y", partitions=8).collect()[0]
    assert (a["n_pos"], a["n_neg"], a["auc"]) == (
        b["n_pos"],
        b["n_neg"],
        b["auc"],
    )


def test_global_rank_big_table_window_is_partitioned(spark):
    """The corpus-sized window in the distributed plan is PARTITIONED
    (per-slice), never a global empty-partition-spec window over the
    input: the only unpartitioned window runs over the
    partitions-sized totals table."""
    df = _synthetic(spark)
    plan = windows.global_rank(
        df, [F.col("v").asc(), F.col("id").asc()], partitions=8
    )._jdf.queryExecution().executedPlan().toString()
    # rows flow through a range exchange, proving the per-slice layout
    assert "rangepartitioning" in plan.lower()

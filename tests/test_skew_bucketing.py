from __future__ import annotations

import re

from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators import skew


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0)],
        "k STRING, v DOUBLE",
    )
    out = skew.salted_agg(
        df,
        ["k"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_v": (F.sum("v"), F.sum("sum_v")),
            "max_v": (F.max("v"), F.max("max_v")),
        },
    )
    got = {r["k"]: (r["n"], r["sum_v"], r["max_v"]) for r in out.collect()}
    assert got["hot"] == (1000, sum(range(1000)), 999.0)
    assert got["cold"] == (1, 1.0, 1.0)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    skew.write_bucketed(left, "t_left", ["k"], num_buckets=8, sort_cols=["k"])
    skew.write_bucketed(right, "t_right", ["k"], num_buckets=8, sort_cols=["k"])
    # at fixture size the planner would broadcast (which also disables
    # bucketed reads); turn it off to observe the co-located join shape
    # that matters when BOTH sides are big
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = skew.colocated_join(spark, "t_left", "t_right", ["k"])
        assert joined.count() == 1000
        # co-located buckets: no shuffle exchange in the join plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_pandas_blas_topk_matches_codegen_topk(spark):
    """The Arrow/BLAS variant must agree with the codegen dot product
    (modulo float summation order — compare at 1e-5)."""
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators import (
        similarity,
    )
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import (
        rank_topk_per_group,
    )
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.registry import (
        load_table,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = similarity.brute_force_topk(e, probes, k=5)
    probes_pd = probes.toPandas()
    scored = similarity.brute_force_topk_pandas(e, probes_pd, k=5)
    approx = rank_topk_per_group(
        scored, ["probe_id"], [F.col("cosine").desc(), F.col("vec_id").asc()], 5
    )
    ex = {(r["probe_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    ap = {(r["probe_id"], r["vec_id"]): r["cosine"] for r in approx.collect()}
    assert set(ex) == set(ap)
    assert all(abs(ex[k] - ap[k]) < 1e-5 for k in ex)

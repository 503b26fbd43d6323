"""Planted-fixture tests for round-10 widening batch 11: the portable
normal CDF, p-value attachment, Benjamini–Hochberg adjustment, and the
one-vs-rest rate z-test — pinned against textbook / scipy values."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    attach_pvalue,
    bh_adjust,
    normal_cdf,
    one_vs_rest_rate_ztest,
)


# ----------------------------------------------------------- norm cdf


def test_normal_cdf_pinned_values(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.96,), (-1.0,), (3.0,)], "z DOUBLE"
    )
    out = {
        r["z"]: r["phi"]
        for r in df.select(
            "z", normal_cdf(F.col("z")).alias("phi")
        ).collect()
    }
    # scipy.stats.norm.cdf reference values; A&S 7.1.26 |err| < 7.5e-8
    assert out[0.0] == pytest.approx(0.5, abs=1e-7)
    assert out[1.96] == pytest.approx(0.9750021049, abs=1e-7)
    assert out[-1.0] == pytest.approx(0.1586552539, abs=1e-7)
    assert out[3.0] == pytest.approx(0.9986501020, abs=1e-7)


def test_attach_pvalue_two_and_one_sided(spark):
    df = spark.createDataFrame([(1.959964,), (0.0,)], "z DOUBLE")
    two = {r["z"]: r["p_value"] for r in attach_pvalue(df, "z").collect()}
    assert two[1.959964] == pytest.approx(0.05, abs=1e-6)
    assert two[0.0] == pytest.approx(1.0)
    one = {
        r["z"]: r["p_value"]
        for r in attach_pvalue(df, "z", sided=1).collect()
    }
    assert one[1.959964] == pytest.approx(0.025, abs=1e-6)
    assert one[0.0] == pytest.approx(0.5)


def test_attach_pvalue_bad_sided_raises(spark):
    df = spark.createDataFrame([(1.0,)], "z DOUBLE")
    with pytest.raises(ValueError, match="sided"):
        attach_pvalue(df, "z", sided=3)


# ------------------------------------------------------------------ bh


def test_bh_uniform_ladder_all_reject(spark):
    # p = k * 0.01: every raw p*m/rank = 0.05 -> all q = 0.05, reject
    rows = [(f"t{k}", k * 0.01) for k in range(1, 6)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = bh_adjust(df, "p", alpha=0.05).collect()
    assert all(r["q_value"] == pytest.approx(0.05) for r in out)
    assert all(r["reject"] for r in out)


def test_bh_textbook_tail_min(spark):
    rows = [("a", 0.005), ("b", 0.03), ("c", 0.04), ("d", 0.5)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = {r["test"]: r for r in bh_adjust(df, "p", alpha=0.05).collect()}
    assert out["a"]["q_value"] == pytest.approx(0.02)
    # rank3 raw = 0.04*4/3 = 0.053333; rank2 raw 0.06 -> tail-min
    assert out["b"]["q_value"] == pytest.approx(0.053333, abs=1e-6)
    assert out["c"]["q_value"] == pytest.approx(0.053333, abs=1e-6)
    assert out["d"]["q_value"] == pytest.approx(0.5)
    assert out["a"]["reject"] and not out["b"]["reject"]
    assert [out[t]["rank"] for t in "abcd"] == [1, 2, 3, 4]


def test_bh_null_pvalues_excluded(spark):
    rows = [("a", 0.01), ("b", None), ("c", 0.02)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = bh_adjust(df, "p").collect()
    assert len(out) == 2  # the NULL row neither ranks nor rejects
    assert {r["test"] for r in out} == {"a", "c"}


def test_bh_grouped_families_independent(spark):
    rows = [("f1", "a", 0.04), ("f1", "b", 0.9),
            ("f2", "c", 0.04), ("f2", "d", 0.04)]
    df = spark.createDataFrame(rows, "fam STRING, test STRING, p DOUBLE")
    out = {
        r["test"]: r
        for r in bh_adjust(df, "p", group_cols=["fam"]).collect()
    }
    # family f1: q_a = min(0.08, ...) tail -> 0.08; family f2 has
    # m=2 ties: q = 0.04*2/2 = 0.04 for rank2, rank1 min(0.08,0.04)
    assert out["a"]["q_value"] == pytest.approx(0.08)
    assert out["c"]["q_value"] == pytest.approx(0.04)
    assert out["d"]["q_value"] == pytest.approx(0.04)


# ------------------------------------------------------- one-vs-rest z


def test_one_vs_rest_pinned(spark):
    rows = [("a", 1)] * 5 + [("a", 0)] * 5 + [("b", 1)] * 2 + [("b", 0)] * 8
    df = spark.createDataFrame(rows, "g STRING, s INT")
    out = {
        r["g"]: r
        for r in one_vs_rest_rate_ztest(
            df, "g", F.col("s") == 1
        ).collect()
    }
    # a: 0.5 vs 0.2, pool 0.35: z = 0.3/sqrt(0.35*0.65*0.2) = 1.406422
    assert out["a"]["rate"] == pytest.approx(0.5)
    assert out["a"]["rest_rate"] == pytest.approx(0.2)
    assert out["a"]["z"] == pytest.approx(1.406422, abs=1e-6)
    assert out["b"]["z"] == pytest.approx(-1.406422, abs=1e-6)


def test_one_vs_rest_single_group_guarded(spark):
    df = spark.createDataFrame([("a", 1), ("a", 0)], "g STRING, s INT")
    r = one_vs_rest_rate_ztest(df, "g", F.col("s") == 1).collect()[0]
    assert r["z"] is None  # empty rest arm -> guarded NULL
    assert r["rest_rate"] is None

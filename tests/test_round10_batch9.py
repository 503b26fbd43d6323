"""Planted-fixture tests for round-10 widening batch 9: Brown–Forsythe
variance homogeneity, Jarque–Bera normality, the Wald–Wolfowitz runs
test, Bollinger bands, Cutler's RSI, and degree assortativity — values
pinned against hand-computed fixtures small enough to check on paper.
"""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    jarque_bera,
    levene_test,
    runs_test,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import (
    bollinger_bands,
    rsi_cutler,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.graph import (
    degree_assortativity,
)


# ------------------------------------------------------------ levene


def test_levene_detects_spread_difference(spark):
    # g1 = [1..5] (z-dev mean 1.2), g2 = [10..50 by 10] (z mean 12)
    # SSB = 291.6, SSW = 282.8, dof = (1, 8) -> W = 291.6/(282.8/8)
    rows = [("a", float(x)) for x in (1, 2, 3, 4, 5)] + [
        ("b", float(x)) for x in (10, 20, 30, 40, 50)
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = levene_test(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 10
    assert r["dof_between"] == 1 and r["dof_within"] == 8
    assert r["w_stat"] == pytest.approx(291.6 / (282.8 / 8), abs=1e-6)


def test_levene_constant_groups_guarded_null(spark):
    rows = [("a", 3.0)] * 4 + [("b", 7.0)] * 4
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    r = levene_test(df, "v", "g").collect()[0]
    assert r["w_stat"] is None  # zero within-group deviation


# -------------------------------------------------------- jarque-bera


def test_jarque_bera_symmetric_platykurtic(spark):
    # [1..5]: skew 0, kurtosis 1.7, JB = 5/6 * (1.3^2/4) = 0.352083
    df = spark.createDataFrame(
        [("g", float(x)) for x in (1, 2, 3, 4, 5)], "g STRING, v DOUBLE"
    )
    r = jarque_bera(df, "v", ["g"]).collect()[0]
    assert r["skewness"] == pytest.approx(0.0, abs=1e-9)
    assert r["kurtosis"] == pytest.approx(1.7, abs=1e-6)
    assert r["jb_stat"] == pytest.approx(0.352083, abs=1e-6)


def test_jarque_bera_right_skew(spark):
    # [0,0,0,0,4]: m2=2.56, skew=1.5, kurt=3.25, JB=1.888021
    df = spark.createDataFrame(
        [("g", 0.0)] * 4 + [("g", 4.0)], "g STRING, v DOUBLE"
    )
    r = jarque_bera(df, "v", ["g"]).collect()[0]
    assert r["skewness"] == pytest.approx(1.5, abs=1e-6)
    assert r["kurtosis"] == pytest.approx(3.25, abs=1e-6)
    assert r["jb_stat"] == pytest.approx(1.888021, abs=1e-6)


def test_jarque_bera_constant_guarded_null(spark):
    df = spark.createDataFrame([("g", 2.0)] * 5, "g STRING, v DOUBLE")
    r = jarque_bera(df, "v", ["g"]).collect()[0]
    assert r["skewness"] is None and r["jb_stat"] is None


# --------------------------------------------------------- runs test


def test_runs_test_oscillation_positive_z(spark):
    # perfectly alternating around the median: 6 runs of 6 values,
    # mu = 4, var = 1.2 -> z = 2/sqrt(1.2) = 1.825742
    rows = [("g", i, v) for i, v in enumerate([1.0, 10.0] * 3)]
    df = spark.createDataFrame(rows, "g STRING, o INT, v DOUBLE")
    r = runs_test(df, "o", "v", ["g"]).collect()[0]
    assert r["n_above"] == 3 and r["n_below"] == 3 and r["runs"] == 6
    assert r["z"] == pytest.approx(1.825742, abs=1e-6)


def test_runs_test_trend_negative_z(spark):
    # monotone series: 2 runs -> z = -1.825742 (same magnitude)
    rows = [("g", i, float(i)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "g STRING, o INT, v DOUBLE")
    r = runs_test(df, "o", "v", ["g"]).collect()[0]
    assert r["runs"] == 2
    assert r["z"] == pytest.approx(-1.825742, abs=1e-6)


def test_runs_test_median_ties_excluded(spark):
    # odd series: the median element itself is dropped
    rows = [("g", i, v) for i, v in enumerate([1.0, 5.0, 9.0])]
    df = spark.createDataFrame(rows, "g STRING, o INT, v DOUBLE")
    r = runs_test(df, "o", "v", ["g"]).collect()[0]
    assert r["n_above"] == 1 and r["n_below"] == 1 and r["runs"] == 2


# ---------------------------------------------------------- bollinger


def test_bollinger_window3_bands_and_breakout(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1.0, 2.0, 3.0, 10.0])],
        "o INT, v DOUBLE",
    )
    out = {
        r["o"]: r
        for r in bollinger_bands(df, "o", "v", window=3, k=1.0).collect()
    }
    assert out[0]["mid"] is None and out[1]["signal"] is None
    # window [1,2,3]: mean 2, sample std 1
    assert out[2]["mid"] == pytest.approx(2.0)
    assert out[2]["upper"] == pytest.approx(3.0)
    assert out[2]["lower"] == pytest.approx(1.0)
    assert out[2]["signal"] == "in"  # 3 > 3 is false
    # window [2,3,10]: mean 5, var 19
    assert out[3]["mid"] == pytest.approx(5.0)
    assert out[3]["upper"] == pytest.approx(5.0 + 19.0 ** 0.5, abs=1e-6)
    assert out[3]["signal"] == "high"


def test_bollinger_grouped_series_independent(spark):
    rows = [("a", i, float(i)) for i in range(5)] + [
        ("b", i, 100.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g STRING, o INT, v DOUBLE")
    out = bollinger_bands(
        df, "o", "v", window=3, k=2.0, group_cols=["g"]
    )
    b_rows = [r for r in out.collect() if r["g"] == "b" and r["o"] >= 2]
    # constant series: zero std, value == mid -> always 'in'
    assert all(r["signal"] == "in" for r in b_rows)
    assert all(r["upper"] == pytest.approx(100.0) for r in b_rows)


# --------------------------------------------------------------- rsi


def test_rsi_cutler_period2_pinned(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1.0, 2.0, 3.0, 2.0, 2.0])],
        "o INT, v DOUBLE",
    )
    out = {r["o"]: r["rsi"] for r in rsi_cutler(df, "o", "v", period=2).collect()}
    assert out[0] is None and out[1] is None  # not enough diffs
    assert out[2] == pytest.approx(100.0)  # gains only
    assert out[3] == pytest.approx(50.0)  # +1 / -1
    assert out[4] == pytest.approx(0.0)  # losses only (0 counts as no gain)


def test_rsi_flat_window_null(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(3)], "o INT, v DOUBLE"
    )
    out = rsi_cutler(df, "o", "v", period=1).collect()
    assert all(r["rsi"] is None for r in out)  # no movement -> NULL


# ------------------------------------------------------ assortativity


def test_assortativity_star_is_minus_one(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src INT, dst INT"
    )
    r = degree_assortativity(df, "src", "dst").collect()[0]
    assert r["n_nodes"] == 4 and r["n_directed_edges"] == 6
    assert r["assortativity"] == pytest.approx(-1.0)


def test_assortativity_path4_pinned(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src INT, dst INT"
    )
    r = degree_assortativity(df, "src", "dst").collect()[0]
    assert r["assortativity"] == pytest.approx(-0.5)


def test_assortativity_regular_graph_null(spark):
    # triangle: every degree 2 -> zero variance -> guarded NULL
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src INT, dst INT"
    )
    r = degree_assortativity(df, "src", "dst").collect()[0]
    assert r["assortativity"] is None


def test_assortativity_dedupes_and_drops_self_loops(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2), (0, 2), (0, 3)],
        "src INT, dst INT",
    )
    r = degree_assortativity(df, "src", "dst").collect()[0]
    # collapses to the 3-star: self-loop (2,2) gone, dup (0,1) once
    assert r["n_nodes"] == 4 and r["n_directed_edges"] == 6
    assert r["assortativity"] == pytest.approx(-1.0)

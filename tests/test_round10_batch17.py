"""Planted-fixture tests for round-10 widening batch 17: two-feature
OLS, partial correlation, restricted mean survival time."""

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    ols2_fit,
    partial_corr,
    rmst,
)


# ----------------------------------------------------------------- ols2


def test_ols2_recovers_exact_plane(spark):
    # y = 2 + 3*x1 - 1*x2 on non-collinear points -> exact fit, r2 = 1
    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0)]
    rows = [("g", 2 + 3 * x1 - x2, x1, x2) for x1, x2 in pts]
    df = spark.createDataFrame(rows, "g STRING, y DOUBLE, x1 DOUBLE, x2 DOUBLE")
    r = ols2_fit(df, "y", "x1", "x2", ["g"]).collect()[0]
    assert r["b0"] == pytest.approx(2.0, abs=1e-6)
    assert r["b1"] == pytest.approx(3.0, abs=1e-6)
    assert r["b2"] == pytest.approx(-1.0, abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_ols2_collinear_features_null(spark):
    rows = [("g", float(i), float(i), 2.0 * i) for i in range(5)]
    df = spark.createDataFrame(rows, "g STRING, y DOUBLE, x1 DOUBLE, x2 DOUBLE")
    r = ols2_fit(df, "y", "x1", "x2", ["g"]).collect()[0]
    assert r["b1"] is None and r["b2"] is None and r["r2"] is None


# --------------------------------------------------------- partial corr


def test_partial_corr_pinned(spark):
    xs = [1.0, 2.0, 3.0, 4.0]
    ys = [4.0, 3.0, 2.0, 2.0]
    zs = [1.0, 1.0, 2.0, 2.0]
    df = spark.createDataFrame(
        [("g", x, y, z) for x, y, z in zip(xs, ys, zs)],
        "g STRING, x DOUBLE, y DOUBLE, z DOUBLE",
    )
    r = partial_corr(df, "x", "y", "z", ["g"]).collect()[0]
    assert r["r_xy"] == pytest.approx(-0.943880, abs=1e-6)
    assert r["r_xz"] == pytest.approx(0.894427, abs=1e-6)
    assert r["r_yz"] == pytest.approx(-0.904534, abs=1e-6)
    assert r["r_xy_given_z"] == pytest.approx(-0.707105, abs=1e-5)


def test_partial_corr_perfect_confounder_null(spark):
    # x == z exactly: r_xz = 1 -> denominator 0 -> guarded NULL
    rows = [("g", float(i), float(5 - i), float(i)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE, y DOUBLE, z DOUBLE")
    r = partial_corr(df, "x", "y", "z", ["g"]).collect()[0]
    assert r["r_xz"] == pytest.approx(1.0)
    assert r["r_xy_given_z"] is None


# ------------------------------------------------------------------ rmst


def test_rmst_step_integration_pinned(spark):
    # events at 5 (S->2/3) and 20 (S->0), censor at 10
    rows = [(5.0, 1), (10.0, 0), (20.0, 1)]
    df = spark.createDataFrame(rows, "duration DOUBLE, event INT")
    r = rmst(df, "duration", "event", tau=30.0).collect()[0]
    # 1*5 + 0.666667*15 + 0*10 (survival carries 6-dp rounding)
    assert r["n_steps"] == 2
    assert r["rmst"] == pytest.approx(15.000005, abs=1e-5)


def test_rmst_no_events_within_tau_absent(spark):
    df = spark.createDataFrame([(40.0, 1)], "duration DOUBLE, event INT")
    assert rmst(df, "duration", "event", tau=30.0).count() == 0


def test_rmst_bad_tau_raises(spark):
    df = spark.createDataFrame([(1.0, 1)], "duration DOUBLE, event INT")
    with pytest.raises(ValueError, match="tau"):
        rmst(df, "duration", "event", tau=0.0)

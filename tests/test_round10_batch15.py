"""Planted-fixture tests for round-10 widening batch 15: split-
conformal intervals and the Qini uplift curve."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    conformal_interval,
    qini_curve,
)


# ---------------------------------------------------------- conformal


def _cal_df(spark):
    # residuals |i - 5.5| for i=1..10: sorted [0.5 x2, 1.5 x2, ... 4.5 x2]
    return spark.createDataFrame(
        [(i, float(i), 5.5) for i in range(1, 11)],
        "id INT, a DOUBLE, p DOUBLE",
    )


def test_conformal_order_statistic_alpha01(spark):
    # k = ceil(11 * 0.9) = 10 -> 10th order statistic = 4.5
    out = conformal_interval(_cal_df(spark), "a", "p", alpha=0.1).collect()
    assert all(r["conf_width"] == pytest.approx(4.5) for r in out)
    assert out[0]["pred_lo"] == pytest.approx(1.0)
    assert out[0]["pred_hi"] == pytest.approx(10.0)


def test_conformal_alpha05_tighter(spark):
    # k = ceil(11 * 0.5) = 6 -> 6th order statistic = 2.5
    out = conformal_interval(_cal_df(spark), "a", "p", alpha=0.5).collect()
    assert all(r["conf_width"] == pytest.approx(2.5) for r in out)


def test_conformal_small_n_clamps_to_max(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, 5.0, 2.0)], "id INT, a DOUBLE, p DOUBLE"
    )
    out = conformal_interval(df, "a", "p", alpha=0.1).collect()
    # k = ceil(3 * 0.9) = 3 > n=2 -> max residual 3.0
    assert all(r["conf_width"] == pytest.approx(3.0) for r in out)


def test_conformal_scoring_rows_get_bands_not_votes(spark):
    rows = [(i, float(i), 5.5) for i in range(1, 11)] + [(99, None, 7.0)]
    df = spark.createDataFrame(rows, "id INT, a DOUBLE, p DOUBLE")
    out = {r["id"]: r for r in conformal_interval(df, "a", "p", alpha=0.1).collect()}
    assert out[99]["conf_width"] == pytest.approx(4.5)  # q unchanged
    assert out[99]["pred_lo"] == pytest.approx(2.5)
    assert len(out) == 11


def test_conformal_bad_alpha_raises(spark):
    df = spark.createDataFrame([(1, 1.0, 1.0)], "id INT, a DOUBLE, p DOUBLE")
    with pytest.raises(ValueError, match="alpha"):
        conformal_interval(df, "a", "p", alpha=0.0)


# --------------------------------------------------------------- qini


def test_qini_pinned_two_buckets(spark):
    rows = [
        (1, True, 10.0, 1),
        (2, False, 9.0, 0),
        (3, True, 8.0, 1),
        (4, False, 7.0, 1),
        (5, True, 6.0, 0),
        (6, False, 5.0, 0),
    ]
    df = spark.createDataFrame(rows, "id INT, t BOOLEAN, score DOUBLE, y INT")
    out = {
        r["bucket"]: r
        for r in qini_curve(df, "t", "score", "y", "id", n_buckets=2).collect()
    }
    b1, b2 = out[1], out[2]
    assert b1["n_treated"] == 2 and b1["n_control"] == 1
    assert b1["cum_qini"] == pytest.approx(2.0)
    assert b1["cum_uplift"] == pytest.approx(1.0)
    # cumulative: pt=2, pc=1, nt=3, nc=3
    assert b2["cum_qini"] == pytest.approx(1.0)
    assert b2["cum_uplift"] == pytest.approx(1 / 3, abs=1e-6)


def test_qini_no_controls_guarded(spark):
    rows = [(i, True, float(i), 1) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "id INT, t BOOLEAN, score DOUBLE, y INT")
    out = qini_curve(df, "t", "score", "y", "id", n_buckets=2).collect()
    assert all(r["cum_qini"] is None for r in out)  # no control arm

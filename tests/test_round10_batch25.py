"""Round-10 widening batch 25: McNemar, Fleiss' kappa, Durbin-Watson,
trimmed mean."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    durbin_watson,
    fleiss_kappa,
    mcnemar_test,
    trimmed_mean,
)

# ---------------------------------------------------------------- mcnemar


def test_mcnemar_textbook(spark):
    # discordant cells 15 vs 5: chi2 = (10-1)^2/20 = 4.05
    rows = (
        [(True, True)] * 40
        + [(True, False)] * 15
        + [(False, True)] * 5
        + [(False, False)] * 40
    )
    df = spark.createDataFrame(rows, "a BOOLEAN, b BOOLEAN")
    row = mcnemar_test(df, "a", "b").collect()[0]
    assert (row["n_a_only"], row["n_b_only"]) == (15, 5)
    assert row["chi2"] == pytest.approx(81 / 20)


def test_mcnemar_no_disagreement_null(spark):
    rows = [(True, True)] * 5 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "a BOOLEAN, b BOOLEAN")
    row = mcnemar_test(df, "a", "b").collect()[0]
    assert row["chi2"] is None


# ----------------------------------------------------------------- fleiss


def test_fleiss_perfect_agreement(spark):
    rows = [(i, "cat_a") for i in range(5) for _ in range(3)]
    df = spark.createDataFrame(rows, "item INT, cat STRING")
    row = fleiss_kappa(df, "item", "cat", n_raters=3).collect()[0]
    assert row["p_bar"] == pytest.approx(1.0)
    # single category used everywhere: p_e = 1 -> kappa NULL
    assert row["kappa"] is None


def test_fleiss_known_small_case(spark):
    # 2 items, 2 raters: item1 (a,a) agree, item2 (a,b) disagree
    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "item INT, cat STRING")
    row = fleiss_kappa(df, "item", "cat", n_raters=2).collect()[0]
    # P_1 = (4-2)/2 = 1, P_2 = (1+1-2)/2 = 0 -> p_bar = 0.5
    assert row["p_bar"] == pytest.approx(0.5)
    # shares: a 3/4, b 1/4 -> p_e = 9/16 + 1/16 = 0.625
    assert row["p_e"] == pytest.approx(0.625)
    assert row["kappa"] == pytest.approx((0.5 - 0.625) / 0.375, abs=1e-3)


def test_fleiss_wrong_panel_size_excluded(spark):
    rows = [(1, "a"), (1, "a"), (2, "a")]  # item 2 has 1 rating
    df = spark.createDataFrame(rows, "item INT, cat STRING")
    row = fleiss_kappa(df, "item", "cat", n_raters=2).collect()[0]
    assert row["n_items"] == 1 and row["n_excluded_items"] == 1


def test_fleiss_bad_raters_raises(spark):
    df = spark.createDataFrame([(1, "a")], "item INT, cat STRING")
    with pytest.raises(ValueError, match="n_raters"):
        fleiss_kappa(df, "item", "cat", n_raters=1)


# ---------------------------------------------------------- durbin-watson


def test_dw_alternating_near_four(spark):
    rows = [("g", t, 1.0 if t % 2 == 0 else -1.0) for t in range(20)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = durbin_watson(df, "g", "t", "v").collect()[0]
    assert row["dw"] > 3.5


def test_dw_trending_near_zero(spark):
    rows = [("g", t, float(t)) for t in range(50)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = durbin_watson(df, "g", "t", "v").collect()[0]
    assert row["dw"] < 0.1


def test_dw_constant_series_null(spark):
    rows = [("g", t, 7.0) for t in range(5)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = durbin_watson(df, "g", "t", "v").collect()[0]
    assert row["dw"] is None  # zero residual energy


def test_dw_single_point_null(spark):
    df = spark.createDataFrame([("g", 1, 3.0)], "g STRING, t INT, v DOUBLE")
    row = durbin_watson(df, "g", "t", "v").collect()[0]
    assert row["dw"] is None


# ------------------------------------------------------------ trimmed mean


def test_trimmed_mean_drops_outliers(spark):
    vals = [1.0] * 8 + [1000.0, -1000.0]
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = trimmed_mean(df, "g", "v", trim=0.1).collect()[0]
    assert row["n"] == 10 and row["n_used"] == 8
    assert row["trimmed_mean"] == pytest.approx(1.0)
    assert row["raw_mean"] == pytest.approx(0.8)


def test_trimmed_mean_zero_trim_is_mean(spark):
    rows = [("g", float(v)) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = trimmed_mean(df, "g", "v", trim=0.0).collect()[0]
    assert row["trimmed_mean"] == pytest.approx(row["raw_mean"]) == 5.5


def test_trimmed_mean_tie_invariant(spark):
    # many equal values at the cut boundary: result independent of
    # which duplicates get trimmed
    rows = [("g", v) for v in [5.0] * 10]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = trimmed_mean(df, "g", "v", trim=0.2).collect()[0]
    assert row["n_used"] == 6
    assert row["trimmed_mean"] == pytest.approx(5.0)


def test_trimmed_mean_bad_trim_raises(spark):
    df = spark.createDataFrame([("g", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="trim"):
        trimmed_mean(df, "g", "v", trim=0.5)

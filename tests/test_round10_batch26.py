"""Round-10 widening batch 26: decision stump, mSPRT always-valid AB,
odds ratio, covariate balance."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    covariate_balance,
    decision_stump,
    msprt_ab,
    odds_ratio,
)

# ---------------------------------------------------------------- stump


def test_stump_perfect_split(spark):
    rows = [(float(v), 0) for v in range(10)] + [
        (float(v), 1) for v in range(10, 20)
    ]
    df = spark.createDataFrame(rows, "x DOUBLE, y INT")
    row = decision_stump(df, "x", "y").collect()[0]
    assert row["threshold"] == pytest.approx(9.0)
    assert row["gain"] == pytest.approx(1.0)  # full entropy recovered
    assert row["left_rate"] == pytest.approx(0.0)
    assert row["right_rate"] == pytest.approx(1.0)


def test_stump_uninformative_zero_gain(spark):
    rows = [(1.0, 0), (1.0, 1), (2.0, 0), (2.0, 1)]
    df = spark.createDataFrame(rows, "x DOUBLE, y INT")
    row = decision_stump(df, "x", "y").collect()[0]
    assert row["gain"] == pytest.approx(0.0)


def test_stump_min_leaf_respected(spark):
    # best split (x<=0) leaves 1 row on the left; min_leaf=2 forbids it
    rows = [(0.0, 1)] + [(float(v), 0) for v in range(1, 6)] + [
        (float(v), 1) for v in range(6, 9)
    ]
    df = spark.createDataFrame(rows, "x DOUBLE, y INT")
    row = decision_stump(df, "x", "y", min_leaf=2).collect()[0]
    assert row["left_n"] >= 2 and row["right_n"] >= 2


def test_stump_bad_min_leaf_raises(spark):
    df = spark.createDataFrame([(1.0, 0)], "x DOUBLE, y INT")
    with pytest.raises(ValueError, match="min_leaf"):
        decision_stump(df, "x", "y", min_leaf=0)


# ---------------------------------------------------------------- msprt


def test_msprt_null_effect_lambda_small(spark):
    rows = [("a", float(v % 7)) for v in range(100)] + [
        ("b", float(v % 7)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = msprt_ab(df, "v", "g", "a", "b").collect()[0]
    # identical arms: mean diff 0 -> log_lambda = 0.5*ln(2s2/(2s2+n t2)) < 0
    assert row["log_lambda"] < 0
    assert row["p_always_valid"] == pytest.approx(1.0)


def test_msprt_strong_effect_significant(spark):
    rows = [("a", 10.0 + (v % 3)) for v in range(200)] + [
        ("b", 0.0 + (v % 3)) for v in range(200)
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = msprt_ab(df, "v", "g", "a", "b").collect()[0]
    assert row["log_lambda"] > 10
    assert row["p_always_valid"] < 0.001


def test_msprt_formula_hand_check(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 0.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    row = msprt_ab(df, "v", "g", "a", "b", tau=1.0).collect()[0]
    s2, n_h, d = 2.0, 2.0, 1.0  # pooled var, harmonic n, mean diff
    denom = 2 * s2 + n_h
    expect = 0.5 * math.log(2 * s2 / denom) + (n_h**2 * d**2) / (4 * s2 * denom)
    assert row["log_lambda"] == pytest.approx(expect, abs=1e-5)


def test_msprt_degenerate_null(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g STRING, v DOUBLE")
    row = msprt_ab(df, "v", "g", "a", "b").collect()[0]
    assert row["log_lambda"] is None


def test_msprt_bad_tau_raises(spark):
    df = spark.createDataFrame([("a", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="tau"):
        msprt_ab(df, "v", "g", "a", "b", tau=0.0)


# ------------------------------------------------------------ odds ratio


def test_or_textbook(spark):
    rows = (
        [(True, True)] * 20
        + [(True, False)] * 10
        + [(False, True)] * 5
        + [(False, False)] * 40
    )
    df = spark.createDataFrame(rows, "e BOOLEAN, o BOOLEAN")
    row = odds_ratio(df, "e", "o").collect()[0]
    assert row["odds_ratio"] == pytest.approx(20 * 40 / (10 * 5), abs=1e-3)
    assert row["ci_low"] < row["odds_ratio"] < row["ci_high"]


def test_or_zero_cell_haldane(spark):
    rows = [(True, True)] * 10 + [(False, False)] * 10 + [(False, True)] * 2
    df = spark.createDataFrame(rows, "e BOOLEAN, o BOOLEAN")
    row = odds_ratio(df, "e", "o").collect()[0]
    # b = 0 -> +0.5 everywhere: OR = (10.5*10.5)/(0.5*2.5)
    assert row["odds_ratio"] == pytest.approx(10.5 * 10.5 / (0.5 * 2.5), abs=1e-2)
    assert math.isfinite(row["ci_high"])


# ------------------------------------------------------- balance table


def test_balance_detects_imbalance(spark):
    rows = [(True, 10.0 + v, 5.0) for v in range(20)] + [
        (False, 0.0 + v, 5.0) for v in range(20)
    ]
    df = spark.createDataFrame(rows, "t BOOLEAN, age DOUBLE, flat DOUBLE")
    out = {r["covariate"]: r for r in covariate_balance(df, "t", ["age", "flat"]).collect()}
    assert out["age"]["smd"] == pytest.approx(10 / math.sqrt(35.0), abs=1e-3)
    assert out["age"]["balanced"] is False
    assert out["flat"]["smd"] is None  # zero variance both arms


def test_balance_balanced_flag(spark):
    rows = [(True, float(v % 10)) for v in range(50)] + [
        (False, float(v % 10)) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "t BOOLEAN, x DOUBLE")
    row = covariate_balance(df, "t", ["x"]).collect()[0]
    assert row["smd"] == pytest.approx(0.0)
    assert row["balanced"] is True
    assert row["n_treat"] == 50 and row["n_control"] == 50


def test_balance_empty_covariates_raises(spark):
    df = spark.createDataFrame([(True, 1.0)], "t BOOLEAN, x DOUBLE")
    with pytest.raises(ValueError, match="covariate"):
        covariate_balance(df, "t", [])

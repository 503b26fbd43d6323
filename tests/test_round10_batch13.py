"""Planted-fixture tests for round-10 widening batch 13: forecast
accuracy metrics, cumulative gains/lift, Kish-weighted stats, and
Flesch readability."""

import pytest
from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cumulative_gains,
    forecast_accuracy,
    weighted_mean_ess,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.text import (
    readability_score,
)


# ------------------------------------------------------------ forecast


def test_forecast_accuracy_pinned(spark):
    rows = [
        (1, 10.0, 9.0),
        (2, 12.0, 13.0),
        (3, 11.0, 11.0),
        (4, 13.0, 12.0),
    ]
    df = spark.createDataFrame(rows, "o INT, a DOUBLE, f DOUBLE")
    r = forecast_accuracy(df, "o", "a", "f").collect()[0]
    assert r["n"] == 4
    assert r["mae"] == pytest.approx(0.75)
    assert r["rmse"] == pytest.approx(0.866025, abs=1e-6)
    # MAPE = mean(0.1, 1/12, 0, 1/13)
    assert r["mape"] == pytest.approx(0.065064, abs=1e-6)
    # sMAPE terms: 2/19, 2/25, 0, 2/25
    assert r["smape"] == pytest.approx(0.066316, abs=1e-6)
    # naive-1 MAE = mean(2,1,2) = 5/3; MASE = 0.75 / (5/3) = 0.45
    assert r["mase"] == pytest.approx(0.45)


def test_forecast_accuracy_zero_actuals_excluded_from_mape(spark):
    rows = [(1, 0.0, 1.0), (2, 10.0, 8.0)]
    df = spark.createDataFrame(rows, "o INT, a DOUBLE, f DOUBLE")
    r = forecast_accuracy(df, "o", "a", "f").collect()[0]
    assert r["mae"] == pytest.approx(1.5)
    assert r["mape"] == pytest.approx(0.2)  # only the nonzero actual


def test_forecast_accuracy_flat_series_mase_null(spark):
    rows = [(i, 5.0, 4.0) for i in range(3)]
    df = spark.createDataFrame(rows, "o INT, a DOUBLE, f DOUBLE")
    r = forecast_accuracy(df, "o", "a", "f").collect()[0]
    assert r["mase"] is None  # naive MAE 0 -> guarded


# --------------------------------------------------------------- gains


def test_cumulative_gains_pinned(spark):
    rows = [
        (i, float(11 - i), 1 if i in (1, 2, 10) else 0)
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "id INT, score DOUBLE, y INT")
    out = {
        r["bucket"]: r
        for r in cumulative_gains(df, "score", "y", "id", n_buckets=5).collect()
    }
    assert out[1]["positives"] == 2 and out[1]["n"] == 2
    assert out[1]["cum_capture_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[1]["lift"] == pytest.approx((2 / 3) / 0.2, abs=1e-6)
    assert out[5]["cum_positives"] == 3
    assert out[5]["cum_capture_rate"] == pytest.approx(1.0)
    assert out[5]["lift"] == pytest.approx(1.0)


def test_cumulative_gains_no_positives_guarded(spark):
    rows = [(i, float(i), 0) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "id INT, score DOUBLE, y INT")
    out = cumulative_gains(df, "score", "y", "id", n_buckets=2).collect()
    assert all(r["capture_rate"] is None for r in out)


# ----------------------------------------------------------------- ess


def test_weighted_mean_ess_pinned(spark):
    rows = [("g", 1.0, 1.0), ("g", 3.0, 3.0), ("g", 9.0, 0.0)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE, w DOUBLE")
    r = weighted_mean_ess(df, "v", "w", ["g"]).collect()[0]
    assert r["n"] == 2  # the zero-weight row is excluded
    assert r["sum_weight"] == pytest.approx(4.0)
    assert r["wmean"] == pytest.approx(2.5)
    assert r["wvar"] == pytest.approx(0.75)
    assert r["ess"] == pytest.approx(1.6)
    assert r["deff"] == pytest.approx(1.25)


def test_weighted_mean_uniform_weights_ess_equals_n(spark):
    rows = [("g", float(i), 2.0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE, w DOUBLE")
    r = weighted_mean_ess(df, "v", "w", ["g"]).collect()[0]
    assert r["ess"] == pytest.approx(5.0)  # uniform weights lose nothing
    assert r["deff"] == pytest.approx(1.0)
    assert r["wmean"] == pytest.approx(3.0)


# --------------------------------------------------------- readability


def test_readability_pinned(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id INT, text STRING"
    )
    r = readability_score(df).collect()[0]
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    # flesch = 206.835 - 1.015*3 - 84.6*1
    assert r["flesch"] == pytest.approx(119.19, abs=1e-6)
    assert r["fk_grade"] == pytest.approx(-2.62, abs=1e-6)


def test_readability_polysyllabic_lowers_score(spark):
    df = spark.createDataFrame(
        [
            (1, "Incomprehensibility notwithstanding, parallelization."),
            (2, "We run. We win."),
        ],
        "doc_id INT, text STRING",
    )
    out = {r["doc_id"]: r for r in readability_score(df).collect()}
    assert out[1]["flesch"] < out[2]["flesch"]
    assert out[1]["fk_grade"] > out[2]["fk_grade"]


def test_readability_empty_text_null(spark):
    df = spark.createDataFrame([(1, "")], "doc_id INT, text STRING")
    r = readability_score(df).collect()[0]
    assert r["n_words"] == 0 and r["flesch"] is None

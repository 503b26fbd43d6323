"""Round-11 widening batch 46: seasonal Mann-Kendall, Neyman
allocation."""

from __future__ import annotations

import datetime as dt

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    neyman_allocation,
    seasonal_mann_kendall,
)

# ---------------------------------------------------------- seasonal MK


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "g STRING, t TIMESTAMP, v DOUBLE"
    )


def test_smk_pure_seasonality_is_no_trend(spark):
    # sawtooth: Jan high, Jul low, repeated 3 years, NO drift.
    # Plain MK would see many up/down pairs; seasonal S = 0 exactly
    # (within each month the values are identical across years).
    rows = []
    for year in (2020, 2021, 2022):
        rows.append(("a", dt.datetime(year, 1, 15), 100.0))
        rows.append(("a", dt.datetime(year, 7, 15), 10.0))
    r = seasonal_mann_kendall(_series(spark, rows), "g", "t", "v").collect()[0]
    assert r["n_seasons"] == 2
    assert r["s_stat"] == 0
    # all-tie strata: variance 0 -> z NULL (nothing to test)
    assert r["z"] is None


def test_smk_drift_accumulates_across_seasons(spark):
    # seasonal pattern PLUS +1/year drift: every like-month pair is
    # an increase -> S = 2 strata * C(3,2) = 6, max possible
    rows = []
    for i, year in enumerate((2020, 2021, 2022)):
        rows.append(("a", dt.datetime(year, 1, 15), 100.0 + i))
        rows.append(("a", dt.datetime(year, 7, 15), 10.0 + i))
    r = seasonal_mann_kendall(_series(spark, rows), "g", "t", "v").collect()[0]
    assert r["s_stat"] == 6
    # var per stratum (n=3, no ties) = 3*2*11/18; two strata
    var = 2 * (3 * 2 * 11) / 18
    assert r["var_s"] == pytest.approx(var, abs=1e-6)
    assert r["z"] == pytest.approx((6 - 1) / var**0.5, abs=1e-5)


# ------------------------------------------------------------- neyman


def test_neyman_proportional_to_n_sigma(spark):
    # stratum a: 100 rows spread 10; b: 100 rows spread 30 ->
    # weights 1:3 -> 25/75 of 100
    rows = []
    for i in range(50):
        rows += [("a", 0.0), ("a", 20.0)]        # sd ~10.05
        rows += [("b", 0.0), ("b", 60.0)]        # sd ~30.15
    df = spark.createDataFrame(rows, "s STRING, x DOUBLE")
    out = {r["s"]: r for r in neyman_allocation(df, "s", "x", 100).collect()}
    assert out["a"]["n_alloc"] + out["b"]["n_alloc"] == 100
    assert out["b"]["n_alloc"] == 75  # exactly 3x the weight
    assert out["a"]["n_alloc"] == 25


def test_neyman_zero_variance_gets_nothing(spark):
    rows = [("flat", 5.0)] * 50 + [("varied", float(v)) for v in range(50)]
    df = spark.createDataFrame(rows, "s STRING, x DOUBLE")
    out = {r["s"]: r for r in neyman_allocation(df, "s", "x", 30).collect()}
    assert out["flat"]["n_alloc"] == 0
    assert out["varied"]["n_alloc"] == 30


def test_neyman_caps_at_population(spark):
    rows = [("tiny", float(v)) for v in (0, 100)] + [
        ("big", float(v % 7)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "s STRING, x DOUBLE")
    out = {r["s"]: r for r in neyman_allocation(df, "s", "x", 500).collect()}
    assert out["tiny"]["n_alloc"] <= 2  # capped at n_pop
    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, "s", "x", 0)

"""Round-11 widening batch 38: Fisher exact, Gumbel return levels,
order-statistic quantile CI."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    fisher_exact,
    gumbel_return_levels,
    quantile_order_ci,
)

# --------------------------------------------------------- fisher_exact


def _tea(spark, a1, a0, b1, b0):
    rows = (
        [("a", 1)] * a1 + [("a", 0)] * a0
        + [("b", 1)] * b1 + [("b", 0)] * b0
    )
    return spark.createDataFrame(rows, "g STRING, y INT")


def test_fisher_tea_tasting(spark):
    # [[3,1],[1,3]]: hypergeometric p(k) over C(8,4)=70 ->
    # two-sided p = (1+16+16+1)/70 = 0.485714
    row = fisher_exact(_tea(spark, 3, 1, 1, 3), "g", "y", "a", "b").collect()[0]
    assert row["n_a_success"] == 3 and row["n_b_fail"] == 3
    assert row["p_value"] == pytest.approx(34 / 70, abs=1e-6)


def test_fisher_perfect_separation(spark):
    # [[4,0],[0,4]]: only the two corner tables are as extreme ->
    # p = 2/70
    row = fisher_exact(_tea(spark, 4, 0, 0, 4), "g", "y", "a", "b").collect()[0]
    assert row["p_value"] == pytest.approx(2 / 70, abs=1e-6)


def test_fisher_no_association_is_one(spark):
    # identical arms: every table is as-or-more-extreme -> p = 1
    row = fisher_exact(_tea(spark, 2, 2, 2, 2), "g", "y", "a", "b").collect()[0]
    assert row["p_value"] == pytest.approx(1.0, abs=1e-6)


def test_fisher_cap_raises(spark):
    df = _tea(spark, 3, 3, 3, 3)
    with pytest.raises(ValueError, match="capped at n"):
        fisher_exact(df, "g", "y", "a", "b", max_n=10)


# ------------------------------------------------- gumbel_return_levels


def test_gumbel_hand_computed(spark):
    # monthly maxima 10, 20, 30 -> m=20, s=10
    rows = [
        (dt.datetime(2023, 1, 5), 10.0),
        (dt.datetime(2023, 1, 20), 7.0),
        (dt.datetime(2023, 2, 5), 20.0),
        (dt.datetime(2023, 3, 5), 30.0),
        (dt.datetime(2023, 3, 6), 1.0),
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, v DOUBLE")
    out = {
        r["period"]: r
        for r in gumbel_return_levels(df, "ts", "v", periods=[10]).collect()
    }
    beta = round(10.0 * math.sqrt(6) / math.pi, 6)
    mu = round(20.0 - 0.5772156649015329 * beta, 6)
    lvl = round(mu - beta * math.log(-math.log(1 - 1 / 10)), 6)
    r = out[10]
    assert r["n_blocks"] == 3
    assert r["beta"] == pytest.approx(beta, abs=1e-6)
    assert r["mu"] == pytest.approx(mu, abs=1e-6)
    assert r["return_level"] == pytest.approx(lvl, abs=1e-5)


def test_gumbel_degenerate_null(spark):
    # single block / zero variance -> NULL fit, row still emitted
    rows = [(dt.datetime(2023, 1, 5), 10.0)]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, v DOUBLE")
    r = gumbel_return_levels(df, "ts", "v", periods=[10]).collect()[0]
    assert r["beta"] is None and r["return_level"] is None


def test_gumbel_bad_period_raises(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2023, 1, 5), 1.0)], "ts TIMESTAMP, v DOUBLE"
    )
    with pytest.raises(ValueError, match="periods"):
        gumbel_return_levels(df, "ts", "v", periods=[1])


# ------------------------------------------------------ quantile_order_ci


def test_quantile_ci_median_of_1_to_100(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v DOUBLE"
    )
    r = quantile_order_ci(df, "v", q=0.5, conf=0.95).collect()[0]
    # nq=50, half=1.959964*5=9.79982 -> ranks 41/60, point rank 50
    assert r["n"] == 100
    assert r["lo_rank"] == 41 and r["hi_rank"] == 60
    assert r["lo"] == 41.0 and r["point"] == 50.0 and r["hi"] == 60.0


def test_quantile_ci_bracket_widens_with_confidence(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v DOUBLE"
    )
    narrow = quantile_order_ci(df, "v", q=0.5, conf=0.8).collect()[0]
    wide = quantile_order_ci(df, "v", q=0.5, conf=0.99).collect()[0]
    assert wide["hi"] - wide["lo"] > narrow["hi"] - narrow["lo"]


def test_quantile_ci_ranks_clamped_at_edges(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "v DOUBLE")
    r = quantile_order_ci(df, "v", q=0.9, conf=0.99).collect()[0]
    assert 1 <= r["lo_rank"] <= r["hi_rank"] <= 5
    assert r["hi"] == 5.0


def test_quantile_ci_validates_inputs(spark):
    df = spark.createDataFrame([(1.0,)], "v DOUBLE")
    with pytest.raises(ValueError, match="q must"):
        quantile_order_ci(df, "v", q=1.0)
    with pytest.raises(ValueError, match="conf must"):
        quantile_order_ci(df, "v", conf=0.0)

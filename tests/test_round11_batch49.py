"""Round-11 widening batch 49: Weibull median-rank fit, Chao1
richness."""

from __future__ import annotations

import math
import random

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    chao1_richness,
    weibull_fit_mrr,
)

# -------------------------------------------------------------- weibull


def test_weibull_recovers_planted_parameters(spark):
    # exact Weibull quantiles (no sampling noise): t_i = lam *
    # (-ln(1-q_i))^(1/k) at the median-rank positions themselves ->
    # the regression is a perfect line and recovers (k, lam)
    k, lam, n = 2.0, 10.0, 50
    rows = []
    for i in range(1, n + 1):
        q = (i - 0.3) / (n + 0.4)
        rows.append(("g", lam * (-math.log(1 - q)) ** (1 / k)))
    df = spark.createDataFrame(rows, "g STRING, t DOUBLE")
    r = weibull_fit_mrr(df, "g", "t").collect()[0]
    assert r["shape"] == pytest.approx(k, abs=1e-3)
    assert r["scale"] == pytest.approx(lam, abs=1e-2)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_weibull_exponential_is_shape_one(spark):
    rnd = random.Random(7)
    rows = [("g", rnd.expovariate(1 / 5.0)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g STRING, t DOUBLE")
    r = weibull_fit_mrr(df, "g", "t").collect()[0]
    assert r["shape"] == pytest.approx(1.0, abs=0.15)
    assert r["scale"] == pytest.approx(5.0, rel=0.2)


def test_weibull_degenerate_groups_null(spark):
    rows = [("tiny", 1.0), ("tiny", 2.0), ("zeros", 0.0), ("zeros", -1.0)]
    df = spark.createDataFrame(rows, "g STRING, t DOUBLE")
    out = {r["g"]: r for r in weibull_fit_mrr(df, "g", "t").collect()}
    assert out["tiny"]["shape"] is None  # n < 3
    assert "zeros" not in out  # non-positive lifetimes dropped


# ---------------------------------------------------------------- chao1


def test_chao1_hand_computed(spark):
    # tokens: a a b c d -> V=4, F1=3 (b,c,d), F2=1 (a)
    rows = [("s", w) for w in ["a", "a", "b", "c", "d"]]
    df = spark.createDataFrame(rows, "g STRING, w STRING")
    r = chao1_richness(df, "g", "w").collect()[0]
    assert r["v_observed"] == 4 and r["f1"] == 3 and r["f2"] == 1
    assert r["chao1"] == pytest.approx(4 + 9 / 2, abs=1e-6)
    assert r["coverage"] == pytest.approx(4 / 8.5, abs=1e-6)


def test_chao1_saturated_vocabulary(spark):
    # every type seen many times: F1=0 -> Chao1 = V, coverage 1
    rows = [("s", w) for w in ["x", "y"] * 10]
    df = spark.createDataFrame(rows, "g STRING, w STRING")
    r = chao1_richness(df, "g", "w").collect()[0]
    assert r["chao1"] == 2.0 and r["coverage"] == 1.0


def test_chao1_no_doubletons_bias_corrected(spark):
    # all singletons: F2=0 -> V + F1(F1-1)/2
    rows = [("s", w) for w in ["a", "b", "c"]]
    df = spark.createDataFrame(rows, "g STRING, w STRING")
    r = chao1_richness(df, "g", "w").collect()[0]
    assert r["chao1"] == pytest.approx(3 + 3 * 2 / 2, abs=1e-6)

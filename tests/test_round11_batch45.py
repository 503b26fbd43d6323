"""Round-11 widening batch 45: Cochran-Armitage trend, exact ordinal
association (gamma / Somers' D)."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cochran_armitage,
    ordinal_association,
)

# ------------------------------------------------------ cochran-armitage


def _dose(spark, spec):
    rows = []
    for g, succ, fail in spec:
        rows += [(g, 1)] * succ + [(g, 0)] * fail
    return spark.createDataFrame(rows, "g STRING, y INT")


def test_ca_hand_computed_rising_trend(spark):
    # rates 10%, 50%, 90% across three levels of 10 each
    df = _dose(spark, [("lo", 1, 9), ("mid", 5, 5), ("hi", 9, 1)])
    r = cochran_armitage(df, "g", "y", ["lo", "mid", "hi"]).collect()[0]
    assert r["n"] == 30 and r["k"] == 3
    p = 0.5
    # t = sum s_i (a_i - n_i p) = 0*(1-5) + 1*(5-5) + 2*(9-5) = 8
    assert r["t_stat"] == pytest.approx(8.0, abs=1e-6)
    var = p * (1 - p) * ((0 + 10 + 40) - (0 + 10 + 20) ** 2 / 30)
    assert r["z"] == pytest.approx(8.0 / math.sqrt(var), abs=1e-5)


def test_ca_flat_rates_zero(spark):
    df = _dose(spark, [("lo", 5, 5), ("mid", 5, 5), ("hi", 5, 5)])
    r = cochran_armitage(df, "g", "y", ["lo", "mid", "hi"]).collect()[0]
    assert abs(r["z"]) < 1e-9


def test_ca_degenerate_pool_null(spark):
    df = _dose(spark, [("lo", 5, 0), ("mid", 5, 0), ("hi", 5, 0)])
    r = cochran_armitage(df, "g", "y", ["lo", "mid", "hi"]).collect()[0]
    assert r["z"] is None  # all-success pool


def test_ca_custom_scores_and_validation(spark):
    df = _dose(spark, [("lo", 1, 9), ("mid", 5, 5), ("hi", 9, 1)])
    r = cochran_armitage(
        df, "g", "y", ["lo", "mid", "hi"], scores=[0.0, 10.0, 20.0]
    ).collect()[0]
    assert r["t_stat"] == pytest.approx(80.0, abs=1e-5)  # scales 10x
    with pytest.raises(ValueError, match="scores"):
        cochran_armitage(df, "g", "y", ["lo", "mid", "hi"], scores=[1.0])
    with pytest.raises(ValueError, match="3 ordered"):
        cochran_armitage(df, "g", "y", ["lo", "mid"])


# --------------------------------------------------- ordinal association


def _grid(spark, cells):
    rows = []
    for rv, cv, n in cells:
        rows += [(rv, cv)] * n
    return spark.createDataFrame(rows, "r STRING, c STRING")


def test_oa_2x2_gamma_is_yules_q(spark):
    # 2x2: gamma == Yule's Q = (ad - bc)/(ad + bc)
    df = _grid(
        spark,
        [("r1", "c1", 30), ("r1", "c2", 10),
         ("r2", "c1", 5), ("r2", "c2", 25)],
    )
    r = ordinal_association(
        df, "r", "c", ["r1", "r2"], ["c1", "c2"]
    ).collect()[0]
    assert r["n_concordant"] == 30 * 25
    assert r["n_discordant"] == 10 * 5
    q = (750 - 50) / (750 + 50)
    assert r["gamma"] == pytest.approx(q, abs=1e-6)
    # Somers adds the one-sided tie pools to the denominators
    assert r["ties_col"] == 30 * 5 + 10 * 25
    assert r["ties_row"] == 30 * 10 + 5 * 25
    assert r["somers_d_col_given_row"] == pytest.approx(
        700 / (800 + r["ties_col"]), abs=1e-6
    )


def test_oa_perfect_association(spark):
    df = _grid(spark, [("r1", "c1", 10), ("r2", "c2", 10)])
    r = ordinal_association(
        df, "r", "c", ["r1", "r2"], ["c1", "c2"]
    ).collect()[0]
    assert r["gamma"] == 1.0
    assert r["somers_d_col_given_row"] == 1.0


def test_oa_independence_near_zero(spark):
    df = _grid(
        spark,
        [("r1", "c1", 10), ("r1", "c2", 10),
         ("r2", "c1", 10), ("r2", "c2", 10)],
    )
    r = ordinal_association(
        df, "r", "c", ["r1", "r2"], ["c1", "c2"]
    ).collect()[0]
    assert r["gamma"] == 0.0


def test_oa_validates(spark):
    df = _grid(spark, [("r1", "c1", 1)])
    with pytest.raises(ValueError, match=">= 2 levels"):
        ordinal_association(df, "r", "c", ["r1"], ["c1", "c2"])

"""Round-10 widening batch 20: Cohen's kappa, proper scoring rules
(log-loss + Brier), WOE/IV feature screening, Mann-Kendall trend."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    classification_loss,
    cohens_kappa,
    mann_kendall,
    woe_iv,
)

# ---------------------------------------------------------------- kappa


def test_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")], "ra STRING, rb STRING"
    )
    row = cohens_kappa(df, "ra", "rb").collect()[0]
    assert row["n"] == 4
    assert row["p_observed"] == pytest.approx(1.0)
    assert row["kappa"] == pytest.approx(1.0)


def test_kappa_textbook_2x2(spark):
    # classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "ra STRING, rb STRING")
    row = cohens_kappa(df, "ra", "rb").collect()[0]
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    assert row["p_observed"] == pytest.approx(po, abs=1e-6)
    assert row["p_expected"] == pytest.approx(pe, abs=1e-6)
    assert row["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-3)


def test_kappa_constant_identical_raters_null(spark):
    # both raters always say "a": pe = 1 -> kappa undefined (NULL)
    df = spark.createDataFrame([("a", "a")] * 5, "ra STRING, rb STRING")
    row = cohens_kappa(df, "ra", "rb").collect()[0]
    assert row["p_expected"] == pytest.approx(1.0)
    assert row["kappa"] is None


def test_kappa_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", None), (None, "b")], "ra STRING, rb STRING"
    )
    row = cohens_kappa(df, "ra", "rb").collect()[0]
    assert row["n"] == 1


# --------------------------------------------------------------- losses


def test_losses_known_values(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (1, 0.6), (0, 0.4)], "y INT, p DOUBLE"
    )
    row = classification_loss(df, "y", "p").collect()[0]
    ll = -(math.log(0.9) + math.log(0.9) + math.log(0.6) + math.log(0.6)) / 4
    br = (0.01 + 0.01 + 0.16 + 0.16) / 4
    assert row["n"] == 4
    assert row["base_rate"] == pytest.approx(0.5)
    assert row["log_loss"] == pytest.approx(ll, abs=1e-5)
    assert row["brier"] == pytest.approx(br, abs=1e-5)


def test_losses_clamp_keeps_finite(spark):
    df = spark.createDataFrame([(1, 0.0), (0, 1.0)], "y INT, p DOUBLE")
    row = classification_loss(df, "y", "p", eps=1e-6).collect()[0]
    assert row["log_loss"] == pytest.approx(-math.log(1e-6), abs=1e-3)
    assert math.isfinite(row["log_loss"])


def test_losses_bad_eps_raises(spark):
    df = spark.createDataFrame([(1, 0.5)], "y INT, p DOUBLE")
    with pytest.raises(ValueError, match="eps"):
        classification_loss(df, "y", "p", eps=0.7)


# --------------------------------------------------------------- woe/iv


def test_woe_iv_hand_computed_no_smoothing(spark):
    # cat A: 8 pos / 2 neg; cat B: 2 pos / 8 neg (strong separator)
    rows = [("A", 1)] * 8 + [("A", 0)] * 2 + [("B", 1)] * 2 + [("B", 0)] * 8
    df = spark.createDataFrame(rows, "f STRING, y INT")
    out = {r["category"]: r for r in woe_iv(df, "f", "y", smoothing=0.0).collect()}
    woe_a = math.log((8 / 10) / (2 / 10))
    assert out["A"]["woe"] == pytest.approx(woe_a, abs=1e-5)
    assert out["B"]["woe"] == pytest.approx(-woe_a, abs=1e-5)
    iv = (0.8 - 0.2) * woe_a + (0.2 - 0.8) * -woe_a
    assert out["A"]["iv_total"] == pytest.approx(iv, abs=1e-4)
    assert out["A"]["iv_total"] == out["B"]["iv_total"]


def test_woe_iv_empty_cell_smoothed_finite(spark):
    rows = [("A", 1)] * 5 + [("B", 0)] * 5  # A has zero negatives
    df = spark.createDataFrame(rows, "f STRING, y INT")
    out = {r["category"]: r for r in woe_iv(df, "f", "y").collect()}
    assert out["A"]["woe"] is not None and math.isfinite(out["A"]["woe"])


def test_woe_iv_empty_cell_unsmoothed_null(spark):
    rows = [("A", 1)] * 5 + [("B", 0)] * 5
    df = spark.createDataFrame(rows, "f STRING, y INT")
    out = {r["category"]: r for r in woe_iv(df, "f", "y", smoothing=0.0).collect()}
    assert out["A"]["woe"] is None  # dist_neg = 0 -> lazy-CASE NULL


def test_woe_iv_negative_smoothing_raises(spark):
    df = spark.createDataFrame([("A", 1)], "f STRING, y INT")
    with pytest.raises(ValueError, match="smoothing"):
        woe_iv(df, "f", "y", smoothing=-1.0)


# --------------------------------------------------------- mann-kendall


def test_mk_strict_increase(spark):
    rows = [("g", i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = mann_kendall(df, "g", "t", "v").collect()[0]
    n = 10
    assert row["s_stat"] == n * (n - 1) // 2  # every pair concordant
    var = n * (n - 1) * (2 * n + 5) / 18
    assert row["var_s"] == pytest.approx(var)
    assert row["z"] == pytest.approx((row["s_stat"] - 1) / math.sqrt(var), abs=1e-3)


def test_mk_strict_decrease_mirrors(spark):
    rows = [("g", i, float(-i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = mann_kendall(df, "g", "t", "v").collect()[0]
    assert row["s_stat"] == -45
    assert row["z"] < 0


def test_mk_constant_series_zero(spark):
    rows = [("g", i, 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = mann_kendall(df, "g", "t", "v").collect()[0]
    assert row["s_stat"] == 0
    # all 5 values tied: var = [5*4*15 - 5*4*15]/18 = 0 -> z NULL
    assert row["var_s"] == pytest.approx(0.0)
    assert row["z"] is None


def test_mk_tie_correction(spark):
    # values [1, 1, 2, 3]: one tie group of size 2
    rows = [("g", 0, 1.0), ("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    row = mann_kendall(df, "g", "t", "v").collect()[0]
    assert row["s_stat"] == 5  # 6 pairs, one tied
    var = (4 * 3 * 13 - 2 * 1 * 9) / 18
    assert row["var_s"] == pytest.approx(var)


def test_mk_groups_independent(spark):
    rows = [("up", i, float(i)) for i in range(5)] + [
        ("down", i, float(-i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    out = {r["g"]: r for r in mann_kendall(df, "g", "t", "v").collect()}
    assert out["up"]["s_stat"] == 10
    assert out["down"]["s_stat"] == -10

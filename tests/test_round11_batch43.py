"""Round-11 widening batch 43: Wilcoxon signed-rank, Cramér–von
Mises."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cramer_von_mises,
    wilcoxon_signed_rank,
)

# ------------------------------------------------------------- wilcoxon


def test_wilcoxon_hand_computed_no_ties(spark):
    # diffs: +1, +2, +3, -4  -> |d| ranks 1,2,3,4; W+ = 1+2+3 = 6
    rows = [(0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (4.0, 0.0)]
    df = spark.createDataFrame(rows, "b DOUBLE, a DOUBLE")
    r = wilcoxon_signed_rank(df, "b", "a").collect()[0]
    assert r["n_pairs"] == 4 and r["n_zeros"] == 0
    assert r["w_plus"] == 6.0
    assert r["mean_w"] == 5.0  # n(n+1)/4
    # sigma = sqrt(4*5*9/24) = sqrt(7.5)
    assert r["sigma_w"] == pytest.approx(7.5**0.5, abs=1e-6)
    assert r["z"] == pytest.approx((6 - 5) / 7.5**0.5, abs=1e-5)


def test_wilcoxon_midranks_and_tie_correction(spark):
    # diffs: +1, +1, -1, +2 -> |d|=1 block of 3 gets midrank 2
    rows = [(0.0, 1.0), (0.0, 1.0), (1.0, 0.0), (0.0, 2.0)]
    df = spark.createDataFrame(rows, "b DOUBLE, a DOUBLE")
    r = wilcoxon_signed_rank(df, "b", "a").collect()[0]
    assert r["w_plus"] == 2 + 2 + 4  # two positive midranks + rank 4
    # ties term: t=3 -> (27-3)/48 subtracted from variance
    var = 4 * 5 * 9 / 24 - (27 - 3) / 48
    assert r["sigma_w"] == pytest.approx(var**0.5, abs=1e-6)


def test_wilcoxon_zeros_dropped_and_counted(spark):
    rows = [(1.0, 1.0), (2.0, 2.0), (0.0, 5.0)]
    df = spark.createDataFrame(rows, "b DOUBLE, a DOUBLE")
    r = wilcoxon_signed_rank(df, "b", "a").collect()[0]
    assert r["n_pairs"] == 1 and r["n_zeros"] == 2


# ------------------------------------------------------------------ cvm


def test_cvm_identical_samples_near_zero(spark):
    vals = [float(v) for v in range(1, 21)]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = cramer_von_mises(df, "g", "x", "a", "b").collect()[0]
    # identical EDFs: T is at its minimum, near (but not exactly) 0
    assert r["t_stat"] < 0.05


def test_cvm_separated_samples_large(spark):
    rows = [("a", float(v)) for v in range(1, 21)] + [
        ("b", float(v)) for v in range(100, 120)
    ]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    sep = cramer_von_mises(df, "g", "x", "a", "b").collect()[0]
    assert sep["t_stat"] > 1.0  # fully separated -> large criterion


def test_cvm_empty_side_null(spark):
    df = spark.createDataFrame([("a", 1.0)], "g STRING, x DOUBLE")
    r = cramer_von_mises(df, "g", "x", "a", "b").collect()[0]
    assert r["t_stat"] is None

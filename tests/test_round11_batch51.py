"""Round-11 widening batch 51: Mood's median test, Page's L trend."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    moods_median,
    page_trend,
)

# ---------------------------------------------------------------- moods


def test_moods_separated_groups_large_chi2(spark):
    rows = [("lo", float(v)) for v in range(1, 11)] + [
        ("hi", float(v)) for v in range(100, 110)
    ]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = moods_median(df, "g", "x").collect()[0]
    # grand median = lower-median order statistic of the pool
    assert r["grand_median"] == 10.0
    # perfect separation: hi all above, lo all at-or-below -> chi2 = n
    assert r["chi2"] == pytest.approx(20.0, abs=1e-6)
    assert r["dof"] == 1


def test_moods_identical_groups_zero(spark):
    vals = [float(v) for v in range(1, 11)]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = moods_median(df, "g", "x").collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_moods_degenerate_all_equal_null(spark):
    rows = [("a", 5.0)] * 5 + [("b", 5.0)] * 5
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = moods_median(df, "g", "x").collect()[0]
    assert r["chi2"] is None  # nothing above the median


# ----------------------------------------------------------------- page


def _blocks(spark, block_vals):
    rows = []
    for b, vals in block_vals:
        for t, v in vals.items():
            rows.append((b, t, float(v)))
    return spark.createDataFrame(rows, "it STRING, t STRING, v DOUBLE")


def test_page_perfect_trend_max_l(spark):
    # 4 blocks, 3 treatments, values always t1 < t2 < t3:
    # every block contributes ranks (1,2,3) aligned with scores ->
    # L = n * sum(j * j) = 4 * 14 = 56, the maximum
    spec = [
        (f"b{i}", {"t1": 1 + i, "t2": 10 + i, "t3": 20 + i})
        for i in range(4)
    ]
    r = page_trend(
        _blocks(spark, spec), "it", "t", "v", ["t1", "t2", "t3"]
    ).collect()[0]
    assert r["n_items"] == 4 and r["k"] == 3
    assert r["l_stat"] == 56.0
    mean_l = 4 * 3 * 16 / 4
    sigma = math.sqrt(4 * 9 * 16 * 2 / 144)
    assert r["mean_l"] == mean_l
    assert r["z"] == pytest.approx((56 - mean_l) / sigma, abs=1e-5)


def test_page_reversed_trend_min_l(spark):
    spec = [
        (f"b{i}", {"t1": 20 + i, "t2": 10 + i, "t3": 1 + i})
        for i in range(4)
    ]
    r = page_trend(
        _blocks(spark, spec), "it", "t", "v", ["t1", "t2", "t3"]
    ).collect()[0]
    # reversed: L = n * (3*1 + 2*2 + 1*3) = 4 * 10 = 40, the minimum
    assert r["l_stat"] == 40.0
    assert r["z"] < 0


def test_page_ties_average_ranks(spark):
    # all treatments equal within the block: every rank is the
    # average 2 -> L = n * 2 * (1+2+3)
    spec = [("b0", {"t1": 5, "t2": 5, "t3": 5})]
    r = page_trend(
        _blocks(spark, spec), "it", "t", "v", ["t1", "t2", "t3"]
    ).collect()[0]
    assert r["l_stat"] == pytest.approx(12.0)
    assert r["z"] == pytest.approx(0.0, abs=1e-9)


def test_page_excludes_incomplete_blocks(spark):
    spec = [("b0", {"t1": 1, "t2": 2, "t3": 3}), ("b1", {"t1": 1})]
    r = page_trend(
        _blocks(spark, spec), "it", "t", "v", ["t1", "t2", "t3"]
    ).collect()[0]
    assert r["n_items"] == 1 and r["n_excluded"] == 1
    with pytest.raises(ValueError, match="3 ordered"):
        page_trend(_blocks(spark, spec), "it", "t", "v", ["t1", "t2"])

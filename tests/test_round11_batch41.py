"""Round-11 widening batches 40-41: Bartlett, ICC(1,1), BY-FDR,
loso mixture weights."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    attach_pvalue,
    bartlett_variance,
    bh_adjust,
    by_adjust,
    icc_oneway,
)

# ------------------------------------------------------------ bartlett


def test_bartlett_equal_variances_near_zero(spark):
    # two groups with IDENTICAL spread: T must be ~0
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v)) for v in (11, 12, 13, 14, 15)
    ]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = bartlett_variance(df, "g", "x").collect()[0]
    assert r["k"] == 2 and r["dof"] == 1
    assert abs(r["t_stat"]) < 1e-6


def test_bartlett_hand_computed(spark):
    # group a: var 2.5 (n=5), group b: var 62.5 (n=5)
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v)) for v in (5, 10, 15, 20, 25)
    ]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = bartlett_variance(df, "g", "x").collect()[0]
    sp2 = (4 * 2.5 + 4 * 62.5) / 8
    t = (8 * math.log(sp2) - (4 * math.log(2.5) + 4 * math.log(62.5)))
    c = 1 + (0.25 + 0.25 - 1 / 8) / 3
    assert r["t_stat"] == pytest.approx(t / c, abs=1e-4)


def test_bartlett_excludes_degenerate_groups(spark):
    rows = (
        [("a", float(v)) for v in (1, 2, 3)]
        + [("b", float(v)) for v in (4, 5, 6)]
        + [("c", 7.0)]            # n < 2
        + [("d", 9.0), ("d", 9.0)]  # zero variance
    )
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    r = bartlett_variance(df, "g", "x").collect()[0]
    assert r["k"] == 2 and r["n_excluded_groups"] == 2


# ----------------------------------------------------------------- icc


def test_icc_perfect_item_separation(spark):
    # within-item variance 0, between large -> ICC ~= 1
    rows = [("i1", 1.0)] * 3 + [("i2", 10.0)] * 3 + [("i3", 20.0)] * 3
    df = spark.createDataFrame(rows, "it STRING, x DOUBLE")
    r = icc_oneway(df, "it", "x", n_raters=3).collect()[0]
    assert r["n_items"] == 3
    assert r["ms_within"] == 0.0
    assert r["icc"] == pytest.approx(1.0)


def test_icc_pure_noise_negative_or_small(spark):
    # identical item means, within-item spread: ICC <= 0
    rows = [
        ("i1", 1.0), ("i1", 3.0),
        ("i2", 1.0), ("i2", 3.0),
        ("i3", 1.0), ("i3", 3.0),
    ]
    df = spark.createDataFrame(rows, "it STRING, x DOUBLE")
    r = icc_oneway(df, "it", "x", n_raters=2).collect()[0]
    assert r["icc"] is not None and r["icc"] <= 0


def test_icc_excludes_wrong_panel_size(spark):
    rows = [("i1", 1.0), ("i1", 2.0), ("i2", 5.0)]
    df = spark.createDataFrame(rows, "it STRING, x DOUBLE")
    r = icc_oneway(df, "it", "x", n_raters=2).collect()[0]
    assert r["n_items"] == 1 and r["n_excluded_items"] == 1
    with pytest.raises(ValueError, match="n_raters"):
        icc_oneway(df, "it", "x", n_raters=1)


# ------------------------------------------------------------------ BY


def test_by_inflates_bh_by_harmonic_factor(spark):
    rows = [("t1", 0.01), ("t2", 0.02), ("t3", 0.04), ("t4", 0.9)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    bh = {r["test"]: r["q_value"] for r in bh_adjust(df, "p").collect()}
    by = {r["test"]: r["q_value"] for r in by_adjust(df, "p").collect()}
    cm = 1 + 1 / 2 + 1 / 3 + 1 / 4
    for t in bh:
        assert by[t] == pytest.approx(min(bh[t] * cm, 1.0), abs=1e-5)
    # BY is uniformly more conservative
    assert all(by[t] >= bh[t] for t in bh)


def test_by_respects_cap_and_flag(spark):
    rows = [("t1", 0.9), ("t2", 0.95)]
    df = spark.createDataFrame(rows, "test STRING, p DOUBLE")
    out = by_adjust(df, "p", alpha=0.05).collect()
    assert all(r["q_value"] <= 1.0 and r["reject"] is False for r in out)


def test_attach_pvalue_then_by_pipeline_shape(spark):
    # smoke the composed path used by the by_sweep query
    rows = [("a", 2.0), ("b", 0.1), ("c", -1.5)]
    df = spark.createDataFrame(rows, "seg STRING, z DOUBLE")
    out = by_adjust(attach_pvalue(df, "z", sided=2), "p_value").collect()
    assert {r["seg"] for r in out} == {"a", "b", "c"}
    assert all(0 <= r["q_value"] <= 1 for r in out)

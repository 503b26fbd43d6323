"""Round-10 widening batch 22: burstiness, chi-square GOF, ECE, RBO."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.similarity import (
    rbo_overlap,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    burstiness,
    chisq_gof,
    expected_calibration_error,
)


def _ts(minute):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


# ------------------------------------------------------------ burstiness


def test_burstiness_periodic_is_minus_one(spark):
    rows = [("cron", _ts(10 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "u STRING, ts TIMESTAMP")
    row = burstiness(df, "u", "ts").collect()[0]
    assert row["mean_gap_s"] == pytest.approx(600.0)
    assert row["sd_gap_s"] == pytest.approx(0.0)
    assert row["burstiness"] == pytest.approx(-1.0)
    assert row["dispersion"] == pytest.approx(0.0)


def test_burstiness_bursty_positive(spark):
    # 9 events in one second, then a huge gap, then one more
    rows = [("bot", _ts(0) + dt.timedelta(seconds=i)) for i in range(9)]
    rows.append(("bot", _ts(10000)))
    df = spark.createDataFrame(rows, "u STRING, ts TIMESTAMP")
    row = burstiness(df, "u", "ts").collect()[0]
    assert row["burstiness"] >= 0.45  # sd ~ 3x mean for this shape


def test_burstiness_min_events_filter(spark):
    rows = [("a", _ts(0)), ("a", _ts(1)), ("b", _ts(0)), ("b", _ts(1)), ("b", _ts(3))]
    df = spark.createDataFrame(rows, "u STRING, ts TIMESTAMP")
    out = burstiness(df, "u", "ts").collect()
    assert {r["entity"] for r in out} == {"b"}  # a has only 2 events


def test_burstiness_bad_min_raises(spark):
    df = spark.createDataFrame([("a", _ts(0))], "u STRING, ts TIMESTAMP")
    with pytest.raises(ValueError, match="min_events"):
        burstiness(df, "u", "ts", min_events=2)


# ------------------------------------------------------------- chisq gof


def test_gof_exact_fit_zero(spark):
    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, "c STRING")
    row = chisq_gof(df, "c", {"a": 0.5, "b": 0.5}).collect()[0]
    assert row["chi2"] == pytest.approx(0.0)
    assert row["n"] == 100 and row["dof"] == 1


def test_gof_known_value(spark):
    # observed 60/40 vs expected 50/50: chi2 = 100/50 + 100/50 = 4
    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, "c STRING")
    row = chisq_gof(df, "c", {"a": 0.5, "b": 0.5}).collect()[0]
    assert row["chi2"] == pytest.approx(4.0)


def test_gof_renormalizes_weights_and_filters(spark):
    rows = [("a",)] * 30 + [("b",)] * 10 + [("zzz",)] * 99
    df = spark.createDataFrame(rows, "c STRING")
    row = chisq_gof(df, "c", {"a": 3, "b": 1}).collect()[0]
    assert row["n"] == 40  # zzz excluded
    assert row["chi2"] == pytest.approx(0.0)


def test_gof_bad_probs_raise(spark):
    df = spark.createDataFrame([("a",)], "c STRING")
    with pytest.raises(ValueError, match="positive"):
        chisq_gof(df, "c", {"a": 0.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        chisq_gof(df, "c", {})


# ------------------------------------------------------------------ ece


def test_ece_perfectly_calibrated_bins(spark):
    # bin [0.6,0.7): conf 0.6, acc 3/5 = 0.6 -> gap 0
    rows = [(1, 0.6), (1, 0.6), (1, 0.6), (0, 0.6), (0, 0.6)]
    df = spark.createDataFrame(rows, "y INT, p DOUBLE")
    row = expected_calibration_error(df, "y", "p").collect()[0]
    assert row["ece"] == pytest.approx(0.0)
    assert row["n_bins_used"] == 1


def test_ece_overconfident(spark):
    # all predicted 0.95, only half correct: gap 0.45
    rows = [(1, 0.95)] * 5 + [(0, 0.95)] * 5
    df = spark.createDataFrame(rows, "y INT, p DOUBLE")
    row = expected_calibration_error(df, "y", "p").collect()[0]
    assert row["ece"] == pytest.approx(0.45, abs=1e-6)
    assert row["mce"] == pytest.approx(0.45, abs=1e-6)


def test_ece_p_equal_one_clamps_to_top_bin(spark):
    rows = [(1, 1.0)] * 3
    df = spark.createDataFrame(rows, "y INT, p DOUBLE")
    row = expected_calibration_error(df, "y", "p").collect()[0]
    assert row["n"] == 3 and row["n_bins_used"] == 1
    assert row["ece"] == pytest.approx(0.0)


def test_ece_weights_by_bin_mass(spark):
    # 9 rows gap 0, 1 row gap 1.0 -> ece = 0.1
    rows = [(1, 0.95)] * 9 + [(1, 0.05)]
    df = spark.createDataFrame(rows, "y INT, p DOUBLE")
    row = expected_calibration_error(df, "y", "p").collect()[0]
    assert row["ece"] == pytest.approx(0.9 * 0.05 + 0.1 * 0.95, abs=1e-6)
    assert row["mce"] == pytest.approx(0.95, abs=1e-6)


def test_ece_bad_bins_raises(spark):
    df = spark.createDataFrame([(1, 0.5)], "y INT, p DOUBLE")
    with pytest.raises(ValueError, match="bins"):
        expected_calibration_error(df, "y", "p", bins=1)


# ------------------------------------------------------------------ rbo


def _rank_df(spark, ranks):
    # ranks: list of (item, rank_a, rank_b)
    return spark.createDataFrame(
        [("g", i, a, b) for i, a, b in ranks],
        "g STRING, item INT, ra INT, rb INT",
    )


def test_rbo_identical_rankings_is_one_at_depth(spark):
    ranks = [(i, i, i) for i in range(1, 6)]
    df = _rank_df(spark, ranks)
    row = rbo_overlap(df, "g", "ra", "rb", k=5, p=0.9).collect()[0]
    # identical prefixes: X_d = d, term = p^(d-1), rbo = (1-p) sum p^(d-1)
    expected = (1 - 0.9) * sum(0.9 ** (d - 1) for d in range(1, 6))
    assert row["rbo"] == pytest.approx(expected, abs=1e-6)


def test_rbo_disjoint_rankings_zero(spark):
    # ranker A ranks items 1-5, ranker B ranks items 6-10 (A-ranks > k)
    rows = [("g", i, i, 100) for i in range(1, 6)] + [
        ("g", 5 + i, 100, i) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g STRING, item INT, ra INT, rb INT")
    row = rbo_overlap(df, "g", "ra", "rb", k=5, p=0.9).collect()[0]
    assert row["rbo"] == pytest.approx(0.0)


def test_rbo_hand_computed_swap(spark):
    # A: [1,2], B: [2,1] at k=2: X_1 = 0, X_2 = 2
    ranks = [(1, 1, 2), (2, 2, 1)]
    df = _rank_df(spark, ranks)
    row = rbo_overlap(df, "g", "ra", "rb", k=2, p=0.5).collect()[0]
    expected = 0.5 * (0.5 ** 0 * 0 / 1 + 0.5 ** 1 * 2 / 2)
    assert row["rbo"] == pytest.approx(expected, abs=1e-6)


def test_rbo_groups_emitted_even_without_overlap(spark):
    rows = [("a", 1, 1, 1), ("b", 2, 50, 60)]
    df = spark.createDataFrame(rows, "g STRING, item INT, ra INT, rb INT")
    out = {r["g"]: r["rbo"] for r in rbo_overlap(df, "g", "ra", "rb", k=5).collect()}
    assert out["b"] == pytest.approx(0.0)
    assert out["a"] > 0


def test_rbo_bad_params_raise(spark):
    df = _rank_df(spark, [(1, 1, 1)])
    with pytest.raises(ValueError, match="k must"):
        rbo_overlap(df, "g", "ra", "rb", k=0)
    with pytest.raises(ValueError, match="p must"):
        rbo_overlap(df, "g", "ra", "rb", p=1.0)

"""Round-10 widening batch 32: profit-curve threshold sweep, weighted
kappa."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    profit_curve,
    weighted_kappa,
)

# ---------------------------------------------------------- profit curve


def _scored(spark):
    # scores: positives clustered high, negatives low, one noisy pair
    rows = [
        (0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0),
        (0.4, 0), (0.3, 0),
    ]
    return spark.createDataFrame(rows, "s DOUBLE, y INT")


def test_profit_confusion_counts(spark):
    df = _scored(spark)
    out = {r["threshold"]: r for r in profit_curve(df, "s", "y", 10, 5).collect()}
    r = out[0.6]  # predict positive for s >= 0.6: tp=3 fp=1 fn=0 tn=3
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 1, 0, 3)
    assert r["profit"] == pytest.approx(3 * 10 - 1 * 5)


def test_profit_best_flag_argmax(spark):
    df = _scored(spark)
    out = profit_curve(df, "s", "y", 10, 5).collect()
    best = [r for r in out if r["is_best"]]
    assert len(best) == 1
    assert best[0]["profit"] == max(r["profit"] for r in out)
    assert best[0]["threshold"] == pytest.approx(0.6)


def test_profit_fn_cost_shifts_threshold_down(spark):
    df = _scored(spark)
    # missing a positive is catastrophic: sweep should choose a LOW
    # threshold that captures every positive
    out = profit_curve(df, "s", "y", 1, 1, fn_cost=100).collect()
    best = [r for r in out if r["is_best"]][0]
    assert best["fn"] == 0


def test_profit_tn_value_counts(spark):
    rows = [(0.9, 1), (0.1, 0)]
    df = spark.createDataFrame(rows, "s DOUBLE, y INT")
    out = {r["threshold"]: r for r in profit_curve(df, "s", "y", 0, 0, tn_value=7).collect()}
    assert out[0.9]["profit"] == pytest.approx(7.0)  # tn=1 at t=0.9


# --------------------------------------------------------- weighted kappa


_CATS = ["low", "mid", "high"]


def test_wkappa_perfect_agreement_is_one(spark):
    rows = [(c, c) for c in _CATS for _ in range(5)]
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    row = weighted_kappa(df, "a", "b", _CATS).collect()[0]
    assert row["obs_penalty"] == pytest.approx(0.0)
    assert row["kappa_w"] == pytest.approx(1.0)


def test_wkappa_near_miss_beats_far_miss(spark):
    # same agreeing mass; the disagreements differ only in DISTANCE
    # (all three categories active, so the weights don't scale out)
    agree = [(c, c) for c in _CATS for _ in range(5)]
    near = agree + [("low", "mid")] * 6 + [("mid", "low")] * 6
    far = agree + [("low", "high")] * 6 + [("high", "low")] * 6
    k_near = weighted_kappa(
        spark.createDataFrame(near, "a STRING, b STRING"), "a", "b", _CATS
    ).collect()[0]["kappa_w"]
    k_far = weighted_kappa(
        spark.createDataFrame(far, "a STRING, b STRING"), "a", "b", _CATS
    ).collect()[0]["kappa_w"]
    assert k_near > k_far


def test_wkappa_hand_computed_2x2(spark):
    # two categories: weights reduce to plain kappa
    rows = (
        [("low", "low")] * 20
        + [("low", "high")] * 5
        + [("high", "low")] * 10
        + [("high", "high")] * 15
    )
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    row = weighted_kappa(df, "a", "b", ["low", "high"]).collect()[0]
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    plain = (po - pe) / (1 - pe)
    assert row["kappa_w"] == pytest.approx(plain, abs=1e-3)


def test_wkappa_out_of_vocab_excluded(spark):
    rows = [("low", "low"), ("weird", "low"), ("low", "nope")]
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    row = weighted_kappa(df, "a", "b", _CATS).collect()[0]
    assert row["n"] == 1


def test_wkappa_bad_categories_raise(spark):
    df = spark.createDataFrame([("a", "a")], "a STRING, b STRING")
    with pytest.raises(ValueError, match="categories"):
        weighted_kappa(df, "a", "b", ["only"])

"""Round-10 widening batch 29: behavior entropy, Markov next-event
backtest, local peaks, ratio-metric delta-method CI."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.funnels import (
    behavior_entropy,
    markov_next_accuracy,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    ratio_metric_ci,
)
from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.windows import (
    local_peaks,
)

# ------------------------------------------------------ behavior entropy


def test_entropy_single_action_zero(spark):
    df = spark.createDataFrame([(1, "a")] * 10, "u INT, act STRING")
    row = behavior_entropy(df, "u", "act").collect()[0]
    assert row["entropy_bits"] == pytest.approx(0.0)
    assert row["n_distinct"] == 1


def test_entropy_uniform_is_log2k(spark):
    rows = [(1, a) for a in ["a", "b", "c", "d"] * 5]
    df = spark.createDataFrame(rows, "u INT, act STRING")
    row = behavior_entropy(df, "u", "act").collect()[0]
    assert row["entropy_bits"] == pytest.approx(2.0, abs=1e-4)


def test_entropy_skewed_between(spark):
    rows = [(1, "a")] * 9 + [(1, "b")]
    df = spark.createDataFrame(rows, "u INT, act STRING")
    row = behavior_entropy(df, "u", "act").collect()[0]
    expect = -(0.9 * math.log2(0.9) + 0.1 * math.log2(0.1))
    assert row["entropy_bits"] == pytest.approx(expect, abs=1e-4)


# ----------------------------------------------------- markov backtest


def _seq(spark, states):
    rows = [(1, i, s) for i, s in enumerate(states)]
    return spark.createDataFrame(rows, "u INT, t INT, s STRING")


def test_markov_deterministic_chain_perfect(spark):
    df = _seq(spark, ["a", "b", "a", "b", "a", "b"])
    out = {r["state"]: r for r in markov_next_accuracy(df, "u", "t", "s").collect()}
    assert out["(all)"]["accuracy"] == pytest.approx(1.0)
    assert out["a"]["predicted_next"] == "b"
    assert out["b"]["predicted_next"] == "a"


def test_markov_majority_prediction(spark):
    # from a: b 3 times, c once -> predict b, accuracy 0.75 on a-rows
    df = _seq(spark, ["a", "b", "a", "b", "a", "b", "a", "c"])
    out = {r["state"]: r for r in markov_next_accuracy(df, "u", "t", "s").collect()}
    assert out["a"]["predicted_next"] == "b"
    assert out["a"]["accuracy"] == pytest.approx(0.75)


def test_markov_tie_breaks_lexicographic(spark):
    df = _seq(spark, ["a", "b", "a", "c", "a"])
    out = {r["state"]: r for r in markov_next_accuracy(df, "u", "t", "s").collect()}
    assert out["a"]["predicted_next"] == "b"  # b and c tied at 1


def test_markov_entities_isolated(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (2, 0, "x")]  # user 2: no transition
    df = spark.createDataFrame(rows, "u INT, t INT, s STRING")
    out = markov_next_accuracy(df, "u", "t", "s").collect()
    total = [r for r in out if r["state"] == "(all)"][0]
    assert total["n_transitions"] == 1


# -------------------------------------------------------------- peaks


def test_peaks_finds_planted_spike(spark):
    vals = [1, 1, 1, 1, 20, 1, 1, 1, 1]
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    out = local_peaks(df, "g", "t", "v", neighbors=2, min_sigma=1.0).collect()
    assert [r["t"] for r in out] == [4]


def test_peaks_plateau_not_peak(spark):
    vals = [1, 1, 5, 5, 5, 1, 1]
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    assert local_peaks(df, "g", "t", "v", neighbors=1).count() == 0


def test_peaks_edges_excluded(spark):
    vals = [20, 1, 1, 1, 1]  # max at edge: not enough left neighbors
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g STRING, t INT, v DOUBLE")
    assert local_peaks(df, "g", "t", "v", neighbors=2).count() == 0


def test_peaks_bad_neighbors_raises(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], "g STRING, t INT, v DOUBLE")
    with pytest.raises(ValueError, match="neighbors"):
        local_peaks(df, "g", "t", "v", neighbors=0)


# --------------------------------------------------------- ratio metric


def test_ratio_ci_hand(spark):
    rows = [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0)]
    df = spark.createDataFrame(rows, "g STRING, n DOUBLE, d DOUBLE")
    row = ratio_metric_ci(df, "g", "n", "d").collect()[0]
    # perfectly proportional: ratio 0.5, variance term cancels to 0
    assert row["ratio"] == pytest.approx(0.5)
    assert row["se"] == pytest.approx(0.0, abs=1e-6)


def test_ratio_ci_variance_positive(spark):
    rows = [("a", 1.0, 10.0), ("a", 9.0, 10.0), ("a", 5.0, 10.0)]
    df = spark.createDataFrame(rows, "g STRING, n DOUBLE, d DOUBLE")
    row = ratio_metric_ci(df, "g", "n", "d").collect()[0]
    # constant denominator: Var(r) = var(n)/(N*mean_d^2) = 16/(3*100)
    assert row["ratio"] == pytest.approx(0.5)
    assert row["se"] == pytest.approx(math.sqrt(16 / 300), abs=1e-4)
    assert row["ci_low"] < 0.5 < row["ci_high"]


def test_ratio_ci_single_unit_null_se(spark):
    df = spark.createDataFrame([("a", 1.0, 2.0)], "g STRING, n DOUBLE, d DOUBLE")
    row = ratio_metric_ci(df, "g", "n", "d").collect()[0]
    assert row["ratio"] == pytest.approx(0.5)
    assert row["se"] is None

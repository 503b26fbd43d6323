"""Round-11 widening batch 48: Bradley-Terry preference strengths."""

from __future__ import annotations

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    bradley_terry,
)


def _duels(spark, spec):
    rows = []
    for w, l_, n in spec:
        rows += [(w, l_)] * n
    return spark.createDataFrame(rows, "w STRING, l STRING")


def test_bt_two_items_closed_form(spark):
    # i beats j 3:1 -> pi_i/pi_j = 3 exactly (two-item BT MLE is the
    # odds); mean-1 normalization -> 1.5 and 0.5
    df = _duels(spark, [("i", "j", 3), ("j", "i", 1)])
    out = {r["item"]: r for r in bradley_terry(df, "w", "l").collect()}
    assert out["i"]["n_wins"] == 3 and out["i"]["n_games"] == 4
    assert out["i"]["strength"] == pytest.approx(1.5, abs=1e-4)
    assert out["j"]["strength"] == pytest.approx(0.5, abs=1e-4)


def test_bt_transitive_ordering(spark):
    # a > b > c in every duel: strengths must order a > b > c
    df = _duels(
        spark,
        [("a", "b", 8), ("b", "a", 2),
         ("b", "c", 8), ("c", "b", 2),
         ("a", "c", 9), ("c", "a", 1)],
    )
    out = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l").collect()}
    assert out["a"] > out["b"] > out["c"]


def test_bt_symmetric_duels_equal_strength(spark):
    df = _duels(spark, [("x", "y", 5), ("y", "x", 5)])
    out = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l").collect()}
    assert out["x"] == pytest.approx(out["y"], abs=1e-6)
    assert out["x"] == pytest.approx(1.0, abs=1e-6)


def test_bt_zero_win_item_goes_to_zero(spark):
    df = _duels(spark, [("a", "b", 4), ("b", "c", 4), ("a", "c", 4)])
    out = {r["item"]: r for r in bradley_terry(df, "w", "l").collect()}
    assert out["c"]["n_wins"] == 0
    assert out["c"]["strength"] < 0.05  # MM drives it toward 0


def test_bt_caps_item_count(spark):
    df = _duels(spark, [(f"i{k}", f"i{k+1}", 1) for k in range(30)])
    with pytest.raises(ValueError, match="capped"):
        bradley_terry(df, "w", "l", max_items=10)
    with pytest.raises(ValueError, match="iters"):
        bradley_terry(df, "w", "l", iters=0)

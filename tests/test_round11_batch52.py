"""Round-11 widening batch 52: G-test, Cohen's h."""

from __future__ import annotations

import math

import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.stats import (
    cohens_h,
    g_test,
)


def _table(spark, cells):
    rows = []
    for a, b, n in cells:
        rows += [(a, b)] * n
    return spark.createDataFrame(rows, "a STRING, b STRING")


def test_g_test_hand_computed(spark):
    # 2x2 [[30,10],[10,30]]: E = 20 everywhere
    df = _table(
        spark,
        [("r1", "c1", 30), ("r1", "c2", 10),
         ("r2", "c1", 10), ("r2", "c2", 30)],
    )
    r = g_test(df, "a", "b").collect()[0]
    g = 2 * (2 * 30 * math.log(30 / 20) + 2 * 10 * math.log(10 / 20))
    assert r["g_stat"] == pytest.approx(g, abs=1e-5)
    assert r["dof"] == 1 and r["n"] == 80


def test_g_test_independent_table_zero(spark):
    df = _table(
        spark,
        [("r1", "c1", 20), ("r1", "c2", 20),
         ("r2", "c1", 10), ("r2", "c2", 10)],
    )
    r = g_test(df, "a", "b").collect()[0]
    assert r["g_stat"] == pytest.approx(0.0, abs=1e-9)


def test_g_test_equals_2n_mutual_information(spark):
    # G = 2N * MI(nats) — spot-check on an asymmetric table
    df = _table(
        spark,
        [("r1", "c1", 40), ("r1", "c2", 5),
         ("r2", "c1", 10), ("r2", "c2", 45)],
    )
    r = g_test(df, "a", "b").collect()[0]
    n = 100
    cells = {("r1", "c1"): 40, ("r1", "c2"): 5,
             ("r2", "c1"): 10, ("r2", "c2"): 45}
    ra = {"r1": 45, "r2": 55}
    cb = {"c1": 50, "c2": 50}
    mi = sum(
        (o / n) * math.log((o / n) / ((ra[a] / n) * (cb[b] / n)))
        for (a, b), o in cells.items()
    )
    assert r["g_stat"] == pytest.approx(2 * n * mi, abs=1e-4)


def _arms(spark, pa_succ, pa_fail, pb_succ, pb_fail):
    rows = ([("a", 1)] * pa_succ + [("a", 0)] * pa_fail
            + [("b", 1)] * pb_succ + [("b", 0)] * pb_fail)
    return spark.createDataFrame(rows, "g STRING, y INT")


def test_cohens_h_hand_computed(spark):
    df = _arms(spark, 50, 50, 20, 80)  # 0.5 vs 0.2
    r = cohens_h(df, "g", "y", "a", "b").collect()[0]
    h = 2 * math.asin(math.sqrt(0.5)) - 2 * math.asin(math.sqrt(0.2))
    assert r["h"] == pytest.approx(h, abs=1e-5)
    assert r["magnitude"] == "medium"  # |h| ~ 0.64


def test_cohens_h_bands_and_nulls(spark):
    same = _arms(spark, 30, 70, 30, 70)
    r = cohens_h(same, "g", "y", "a", "b").collect()[0]
    assert r["h"] == pytest.approx(0.0, abs=1e-9)
    assert r["magnitude"] == "negligible"
    empty = _arms(spark, 10, 10, 0, 0)
    r2 = cohens_h(empty, "g", "y", "a", "b").collect()[0]
    assert r2["h"] is None and r2["magnitude"] is None
